package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Model-based quality gate (QualityModel) — the CCNet/fastText-style
  * classifier filter: fit target-vs-rest on a trusted slice, score the
  * corpus, keep look-alikes. The corpus plants a disjoint-vocabulary
  * trusted domain so separability (and thus the gate's behavior) is a
  * property of the operator, not luck. */
class QualityModelSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // trusted domain speaks a vocabulary disjoint from the word-salad corpus
  private def trustedText(i: Int): String =
    Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")
      .drop(i % 3).mkString(" ") + s" theta iota kappa lambda mu nu xi"

  private def staged = {
    import spark.implicits._
    val base = graft.Tables.documents(spark, dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val trusted = (0 until 30).map(i =>
      (20000L + i, trustedText(i), "en", "trusted", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val lookalikes = (0 until 5).map(i =>
      (30000L + i, trustedText(i + 1), "en", "src0", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    base.unionByName(trusted).unionByName(lookalikes)
  }

  behavior of "QualityModel"

  it should "rank target-vocabulary docs above word salad in quality_p" in {
    val docs = staged.cache()
    val model = QualityModel.fit(docs, "text", "source", Seq("trusted"))
    val scored = QualityModel.scoreAll(model, docs, "text")
      .select("doc_id", "quality_p").cache()
    val p = scored.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // every planted look-alike outscores every original word-salad doc
    val lookalikeMin = (0 until 5).map(i => p(30000L + i)).min
    val saladMax = p.filter(_._1 < 20000L).values.max
    lookalikeMin should be > saladMax
    // and the probabilities are decisive, not coin flips
    lookalikeMin should be > 0.9
    saladMax should be < 0.5
  }

  it should "gate deterministically and keep the trusted slice by construction" in {
    val docs = staged.cache()
    val kept = QualityModel
      .gate(docs, "text", "source", Seq("trusted"), threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // trusted + look-alikes survive; the bulk of the salad does not
    (20000L until 20030L).foreach(id => kept should contain(id))
    (30000L until 30005L).foreach(id => kept should contain(id))
    kept.count(_ < 20000L) should be < 100
    // deterministic: partitioning must not change the verdict
    val again = QualityModel
      .gate(docs.repartition(7), "text", "source", Seq("trusted"),
        threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    again shouldBe kept
  }

  it should "run as the model_gate corpus step" in {
    val cc = graft.config.CorpusConf(steps = Seq(
      graft.config.CorpusStepConf(op = "model_gate",
        keepLangs = Seq("trusted"), groupColumn = "source",
        threshold = 0.5)))
    val kept = graft.CorpusRunner.applyStep(staged, cc.steps.head, cc)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    (20000L until 20030L).foreach(id => kept should contain(id))
    kept.count(_ < 20000L) should be < 100
    // schema is untouched — gates filter, they never mutate columns
    graft.CorpusRunner.applyStep(staged, cc.steps.head, cc)
      .columns shouldBe staged.columns
  }

  it should "pass caller columns named label/prediction/probability through untouched" in {
    // the collision case the __qm_ prefix exists for: a corpus that
    // already carries ML-ish column names must come out of the gate with
    // those columns intact, values unchanged
    val docs = staged
      .withColumn("label", col("doc_id") % 3)
      .withColumn("prediction", col("doc_id") % 5)
      .withColumn("probability", col("doc_id") % 7)
      .cache()
    val model = QualityModel.fit(docs, "text", "source", Seq("trusted"))
    val scored = QualityModel.scoreAll(model, docs, "text")
    scored.columns.toSeq shouldBe (docs.columns.toSeq :+ "quality_p")
    scored.filter(col("label") =!= col("doc_id") % 3 ||
      col("prediction") =!= col("doc_id") % 5 ||
      col("probability") =!= col("doc_id") % 7).count() shouldBe 0L
    val gated = QualityModel
      .gate(docs, "text", "source", Seq("trusted"), threshold = 0.5)
    gated.columns.toSeq shouldBe docs.columns.toSeq
  }

  it should "fail loudly when the target slice is empty in the data" in {
    val ex = intercept[IllegalArgumentException] {
      QualityModel.fit(staged, "text", "source", Seq("no_such_source"))
    }
    ex.getMessage should include("no rows match targetValues")
  }

  it should "reject bad model_gate configs in the validator" in {
    val bad = graft.config.GraftConf.fromJson(
      """{
        |  "project": {"name": "qm", "root": "/tmp/graft-qm"},
        |  "data": {"source": "parquet:///tmp/none.parquet"},
        |  "columns": {"response": "lang"},
        |  "corpus": {"steps": [
        |    {"op": "model_gate", "threshold": 0.5},
        |    {"op": "model_gate", "keepLangs": ["trusted"], "threshold": 1.5}
        |  ]}
        |}""".stripMargin)
    val errs = graft.config.ConfigValidator.validate(bad)
    errs.exists(_.message.contains("model_gate")) shouldBe true
    errs.count(_.message.contains("model_gate")) shouldBe 2
  }
}
