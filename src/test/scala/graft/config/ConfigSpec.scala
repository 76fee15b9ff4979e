package graft.config

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class ConfigSpec extends AnyFlatSpec with Matchers {

  behavior of "GraftConf JSON parsing"

  it should "parse a full config with defaults for missing sections" in {
    val c = GraftConf.fromJson(
      """{"data": {"source": "parquet:///tmp/x.parquet"},
        | "columns": {"response": "y", "text": ["t"]},
        | "training": {"algorithm": "svm", "plattScaling": true}}""".stripMargin)
    c.data.source shouldBe "parquet:///tmp/x.parquet"
    c.columns.response shouldBe "y"
    c.training.algorithm shouldBe "svm"
    c.training.plattScaling shouldBe true
    c.sampling.samplingType shouldBe "random"
    c.sampling.seed shouldBe 20L
    c.vectorization.method shouldBe "tfidf"
  }

  behavior of "ConfigValidator"

  private val base = GraftConf(
    data = DataConf(source = "parquet:///tmp/x.parquet"),
    columns = ColumnsConf(response = "y", text = Seq("t"), numerical = Seq("n")),
    preprocessing = Seq(PreprocessStep(op = "tokenizer", inputColumn = "t")))

  it should "accept a valid config" in {
    ConfigValidator.validate(base) shouldBe empty
  }

  it should "reject unknown source formats, ops, algorithms and modes" in {
    val bad = base.copy(
      data = base.data.copy(source = "ftp://x"),
      preprocessing = Seq(PreprocessStep(op = "nope", inputColumn = "t")),
      training = TrainingConf(algorithm = "xgboost"),
      vectorization = VectorizationConf(method = "bm25"))
    val sections = ConfigValidator.validate(bad).map(_.section)
    sections should contain allOf ("data", "preprocessing", "training", "vectorization")
  }

  it should "reject splits that do not sum to 100" in {
    val bad = base.copy(sampling = SamplingConf(split = Seq(70, 20)))
    ConfigValidator.validate(bad).map(_.section) should contain("sampling")
  }

  it should "require conditions for conditional sampling" in {
    val bad = base.copy(sampling = SamplingConf(samplingType = "conditional"))
    ConfigValidator.validate(bad).map(_.section) should contain("sampling")
  }

  it should "track chained preprocessing outputs incl. implicit names" in {
    val ok = base.copy(preprocessing = Seq(
      PreprocessStep(op = "case_normalization", inputColumn = "t"),         // → t_c0
      PreprocessStep(op = "stemming", inputColumn = "t_c0"),                // → t_c0_c1
      PreprocessStep(op = "tokenizer", inputColumn = "t_c0_c1",
        outputColumn = Some("toks"))))
    ConfigValidator.validate(ok) shouldBe empty
    val bad = base.copy(preprocessing = Seq(
      PreprocessStep(op = "stemming", inputColumn = "unknown_col")))
    ConfigValidator.validate(bad) should not be empty
  }

  it should "enforce op-specific requirements" in {
    val bad = base.copy(preprocessing = Seq(
      PreprocessStep(op = "nullcheck", inputColumn = "t"),                 // missing value
      PreprocessStep(op = "regex_replacement", inputColumn = "t"),         // missing pairs
      PreprocessStep(op = "lemma", inputColumn = "t")))                    // missing dict
    ConfigValidator.validate(bad).size should be >= 3
  }

  it should "guard skip-gram window and binning config" in {
    val bad = base.copy(featureGeneration = FeatureGenConf(
      skipGramWindow = 2,
      binning = Seq(
        BinningConf("n", "equidistant", buckets = 1),
        BinningConf("missing", "intervals", intervals = Seq(1.0)))))
    val errs = ConfigValidator.validate(bad)
    errs.count(_.section == "featureGeneration") should be >= 4
  }

  it should "reject platt scaling on non-svm and topK on binary" in {
    val bad = base.copy(training =
      TrainingConf(algorithm = "logistic_regression", plattScaling = true, topK = 3))
    ConfigValidator.validate(bad).count(_.section == "training") shouldBe 2
  }

  // per-engine scope/dependency checks, mirroring the reference's
  // ConfigValidatorNegativeTest family

  it should "require a tokenizer when text columns are declared" in {
    val bad = base.copy(preprocessing = Seq(
      PreprocessStep(op = "case_normalization", inputColumn = "t")))
    val errs = ConfigValidator.validate(bad)
    errs.map(_.section) should contain ("vectorization")
    errs.mkString should include ("tokenizer")
    // no text columns → numeric-only run, tokenizer not required
    val numericOnly = bad.copy(
      columns = bad.columns.copy(text = Nil), preprocessing = Nil)
    ConfigValidator.validate(numericOnly) shouldBe empty
  }

  it should "enforce the uplift scope rules" in {
    // uplift + ovr: not a single binary base model
    val ovr = base.copy(training = TrainingConf(algorithm = "logistic_regression",
      buildType = "ovr", uplift = Some("treat")))
    ConfigValidator.validate(ovr).count(_.section == "training") should be >= 1
    // uplift + svm without platt: nothing to difference
    val svm = base.copy(training =
      TrainingConf(algorithm = "svm", uplift = Some("treat")))
    ConfigValidator.validate(svm).mkString should include ("plattScaling")
    // treatment column must not be a text column
    val txt = base.copy(training = TrainingConf(algorithm = "logistic_regression",
      uplift = Some("t")))
    ConfigValidator.validate(txt).mkString should include ("text column")
    // the valid form passes
    val ok = base.copy(training = TrainingConf(algorithm = "svm",
      plattScaling = true, uplift = Some("treat")))
    ConfigValidator.validate(ok) shouldBe empty
  }

  it should "reject non-increasing interval boundaries and lone conditions" in {
    val bad = base.copy(
      sampling = SamplingConf(samplingType = "conditional",
        conditions = Seq("y = 'pos'")),
      featureGeneration = FeatureGenConf(binning = Seq(
        BinningConf("n", "intervals", intervals = Seq(5.0, 5.0, 10.0)))))
    val errs = ConfigValidator.validate(bad)
    errs.mkString should include ("strictly increasing")
    errs.mkString should include (">= 2 conditions")
  }

  behavior of "configChecks.json field rules"

  it should "load the rule table from the classpath" in {
    ConfigValidator.fieldRules should not be empty
    // every rule path's first segment must be a real GraftConf section
    val sections = Set("project", "data", "columns", "sampling",
      "preprocessing", "featureGeneration", "vectorization", "training",
      "tuning", "postPredictFilter", "corpus", "numPages")
    ConfigValidator.fieldRules.foreach { r =>
      sections should contain (r.path.split('.').head)
    }
  }

  it should "pass a valid raw config through the field rules" in {
    ConfigValidator.validateFields(
      """{"data": {"source": "parquet:///tmp/x.parquet"},
        | "training": {"algorithm": "svm"}}""".stripMargin) shouldBe empty
  }

  it should "enforce pattern, datatype, range and canBeEmpty" in {
    // missing data.source (canBeEmpty=false)
    ConfigValidator.validateFields("""{"training": {}}""")
      .mkString should include ("data.source must be set")
    // bad scheme (pattern)
    ConfigValidator.validateFields(
      """{"data": {"source": "ftp://x"}}""")
      .mkString should include ("does not match")
    // wrong datatype
    ConfigValidator.validateFields(
      """{"data": {"source": "parquet:///x"}, "tuning": {"folds": "three"}}""")
      .mkString should include ("tuning.folds must be a int")
    // out of range
    ConfigValidator.validateFields(
      """{"data": {"source": "parquet:///x"}, "tuning": {"folds": 1}}""")
      .mkString should include ("tuning.folds must be in")
  }

  it should "gate conditional rules on withConditions" in {
    // hyperband without a grid → the conditioned rule fires
    ConfigValidator.validateFields(
      """{"data": {"source": "parquet:///x"},
        | "tuning": {"method": "hyperband"}}""".stripMargin)
      .mkString should include ("tuning.grid must be set")
    // non-hyperband tuning: same absent grid is fine
    ConfigValidator.validateFields(
      """{"data": {"source": "parquet:///x"},
        | "tuning": {"method": "cv", "folds": 3}}""".stripMargin) shouldBe empty
  }

  it should "compose field rules with the semantic checks in validateAll" in {
    val errs = ConfigValidator.validateAll(
      """{"data": {"source": "parquet:///tmp/x.parquet"},
        | "columns": {"response": "y", "text": ["t"]},
        | "training": {"algorithm": "svm", "plattScaling": true},
        | "tuning": {"method": "cv", "folds": 1}}""".stripMargin)
    errs.mkString should include ("tuning.folds must be in")   // field rule
    errs.mkString should include ("tokenizer")                 // semantic
  }
}
