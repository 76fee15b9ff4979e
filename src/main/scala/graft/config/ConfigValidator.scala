package graft.config

/** Semantic config validation — the pipeline's "analyzer"
  * (ref: util/conf/ConfigValidator.scala:14-146 and the per-engine
  * validate() methods). Pure functions over [[GraftConf]]; returns ALL
  * violations, not just the first, so a user fixes a config in one pass.
  */
object ConfigValidator {

  final case class Violation(section: String, message: String) {
    override def toString = s"[$section] $message"
  }

  private val sourceFormats = Set("parquet", "csv", "tsv", "json", "views", "jdbc")
  private val samplingTypes = Set("random", "conditional", "stratified")
  private val preprocessOps = Set("tokenizer", "case_normalization", "stemming",
    "contractions_replacement", "lemma", "sentence_marker", "stopwords",
    "nullcheck", "word_classes_replacement", "regex_replacement", "regex_removal")
  private val binningModes = Set("equidistant", "equiarea", "intervals")
  private val vecMethods = Set("hashingtf", "count_vectorizer", "word2vec", "tfidf")
  private val algorithms = Set("logistic_regression", "svm", "decision_tree",
    "random_forest", "gbt", "naive_bayes", "mlp")
  private val buildTypes = Set("binary", "multi_intent", "ovr")
  private val tuningMethods = Set("none", "cv", "hyperband")

  def validate(c: GraftConf): Seq[Violation] = {
    val v = Seq.newBuilder[Violation]
    def err(section: String, msg: String): Unit = v += Violation(section, msg)

    // data
    val scheme = c.data.source.takeWhile(_ != ':')
    if (!sourceFormats(scheme))
      err("data", s"unknown source format '$scheme' (expected ${sourceFormats.mkString("|")})")
    if (scheme == "views" && c.data.queries.isEmpty)
      err("data", "source 'views://' requires at least one entry in data.queries")
    if (scheme == "jdbc" && c.data.queries.isEmpty)
      err("data", "source 'jdbc://' requires data.queries[0] as the database-side query")

    // sampling
    if (!samplingTypes(c.sampling.samplingType))
      err("sampling", s"unknown samplingType '${c.sampling.samplingType}'")
    if (c.sampling.samplingType == "conditional") {
      if (c.sampling.conditions.isEmpty)
        err("sampling", "conditional sampling requires conditions[]")
      else if (c.sampling.conditions.size < 2)
        err("sampling", "conditional sampling requires >= 2 conditions (train + test)")
    } else {
      if (c.sampling.split.isEmpty)
        err("sampling", "split[] must be non-empty")
      if (c.sampling.split.exists(s => s <= 0 || s >= 100))
        err("sampling", s"every split value must be in (0, 100), got ${c.sampling.split.mkString(",")}")
      if (math.abs(c.sampling.split.sum - 100.0) > 1e-9)
        err("sampling", s"split[] must sum to 100 (got ${c.sampling.split.sum})")
    }
    c.sampling.rebalance.foreach { r =>
      if (r.targetRatio <= 0 || r.targetRatio >= 1)
        err("sampling", s"rebalance.targetRatio must be in (0,1), got ${r.targetRatio}")
      if (!Set("undersample", "oversample")(r.mode))
        err("sampling", s"unknown rebalance.mode '${r.mode}'")
    }

    // preprocessing: ops known; every input column must be declared text,
    // or the output of an earlier step (chained columns).
    val declared = scala.collection.mutable.Set[String](c.columns.text: _*)
    c.preprocessing.zipWithIndex.foreach { case (p, i) =>
      if (!preprocessOps(p.op)) err("preprocessing", s"step $i: unknown op '${p.op}'")
      if (!declared(p.inputColumn))
        err("preprocessing",
          s"step $i: input '${p.inputColumn}' is not a declared text column or earlier output")
      // register this step's output — explicit name or the engine's
      // implicit `<input>_c<i>` (PreprocessingEngine.buildStages)
      declared += p.outputColumn.getOrElse(s"${p.inputColumn}_c$i")
      p.op match {
        case "contractions_replacement" | "lemma"
            if p.replacements.isEmpty && p.file.isEmpty =>
          err("preprocessing", s"step $i: '${p.op}' requires replacements{} or file")
        case "word_classes_replacement" | "regex_replacement"
            if p.pairs.isEmpty && p.file.isEmpty =>
          err("preprocessing", s"step $i: '${p.op}' requires pairs[] or file")
        case "regex_removal" if p.pairs.isEmpty && p.pattern.isEmpty && p.file.isEmpty =>
          err("preprocessing", s"step $i: 'regex_removal' requires pairs[], pattern or file")
        case "nullcheck" if p.value.isEmpty =>
          err("preprocessing", s"step $i: 'nullcheck' requires value")
        case _ => ()
      }
      p.pairs.zipWithIndex.foreach { case (pr, j) =>
        if (pr.size != 2)
          err("preprocessing", s"step $i: pairs[$j] must be [regex, replacement]")
      }
    }

    // feature generation
    if (c.featureGeneration.skipGramWindow != 0 && c.featureGeneration.skipGramWindow < 3)
      err("featureGeneration", "skipGramWindow must be 0 (off) or >= 3 (ref: SkipGramGenerator guard)")
    c.featureGeneration.ngrams.foreach { n =>
      if (n < 2) err("featureGeneration", s"ngram size $n < 2 (unigrams are the base tokens)")
    }
    (c.featureGeneration.binning ++
      c.featureGeneration.binningPerPage.flatten).foreach { b =>
      if (!binningModes(b.mode)) err("featureGeneration", s"unknown binning mode '${b.mode}'")
      if (b.mode == "intervals" && b.intervals.size < 2)
        err("featureGeneration", "intervals binning requires >= 2 boundary values")
      if (b.mode == "intervals" && b.intervals.size >= 2 &&
          b.intervals.sliding(2).exists { case Seq(a, x) => a >= x; case _ => false })
        err("featureGeneration",
          s"intervals for '${b.inputColumn}' must be strictly increasing")
      if (b.mode != "intervals" && b.buckets < 2)
        err("featureGeneration", s"binning buckets must be >= 2, got ${b.buckets}")
      if (!c.columns.numerical.contains(b.inputColumn))
        err("featureGeneration", s"binning input '${b.inputColumn}' is not a numerical column")
    }

    // vectorization
    if (!vecMethods(c.vectorization.method))
      err("vectorization", s"unknown method '${c.vectorization.method}'")
    if (c.vectorization.slots <= 0)
      err("vectorization", s"slots must be > 0, got ${c.vectorization.slots}")
    // per-engine dependency check (ref: VectorizationEngine.scala:255-374 —
    // vectorization inputs must be outputs of an upstream step): text
    // vectorization consumes tokenizer outputs, so declared text columns
    // with no tokenizer step can never reach the feature vector
    if (c.columns.text.nonEmpty && !c.preprocessing.exists(_.op == "tokenizer"))
      err("vectorization",
        s"method '${c.vectorization.method}' requires a 'tokenizer' preprocessing " +
          "step to produce its token input (declared text columns are never " +
          "vectorized otherwise)")

    // training + tuning
    if (!algorithms(c.training.algorithm))
      err("training", s"unknown algorithm '${c.training.algorithm}'")
    if (!buildTypes(c.training.buildType))
      err("training", s"unknown buildType '${c.training.buildType}'")
    if (c.training.plattScaling && c.training.algorithm != "svm")
      err("training", "plattScaling only applies to svm rawPrediction outputs")
    if (c.training.topK > 0 && c.training.buildType == "binary")
      err("training", "topK requires a multi-class buildType")
    // uplift scope checks (ref: ModelTrainingEngine.validate — the uplift
    // transformer differences ONE binary base model's probabilities)
    c.training.uplift.foreach { t =>
      if (t.trim.isEmpty)
        err("training", "uplift treatment column name must be non-empty")
      if (c.training.buildType != "binary")
        err("training", "uplift requires buildType 'binary' " +
          "(p(treated) − p(control) of one base model)")
      if (c.training.algorithm == "svm" && !c.training.plattScaling)
        err("training", "uplift with svm requires plattScaling " +
          "(LinearSVC emits no probability to difference)")
      if (c.columns.text.contains(t))
        err("training", s"uplift treatment column '$t' cannot be a text column")
    }
    if (!tuningMethods(c.tuning.method))
      err("tuning", s"unknown tuning method '${c.tuning.method}'")
    if (c.tuning.method == "cv" && c.tuning.folds < 2)
      err("tuning", s"cv folds must be >= 2, got ${c.tuning.folds}")
    if (c.tuning.method == "hyperband" && c.tuning.eta < 2)
      err("tuning", s"hyperband eta must be >= 2, got ${c.tuning.eta}")

    // corpus-cleaning chain
    val corpusOps = Set("dedup_exact", "dedup_minhash", "quality_gate",
      "lang_filter", "token_bounds", "pii_scrub", "source_mix", "temp_mix",
      "span_dedup", "dsir_sample", "ppl_gate", "normalize", "entropy_gate",
      "dedup_simhash", "model_gate", "span_scrub", "decontam", "token_mix",
      "rank_gate", "semantic_decontam", "chunk", "curriculum", "soft_dedup",
      "exif_scrub")
    c.corpus.foreach { cc =>
      if (cc.steps.isEmpty) err("corpus", "corpus.steps[] must be non-empty")
      if (cc.steps.exists(_.op == "soft_dedup")) {
        if (cc.weightColumn.isEmpty)
          err("corpus", "'soft_dedup' requires a non-empty weightColumn")
        if (cc.weightColumn == cc.textColumn || cc.weightColumn == cc.idColumn)
          err("corpus", s"weightColumn '${cc.weightColumn}' collides with " +
            "the text/id column")
      }
      cc.steps.zipWithIndex.foreach { case (s, i) =>
        if (!corpusOps(s.op)) err("corpus", s"step $i: unknown op '${s.op}'")
        s.op match {
          case "lang_filter" if s.keepLangs.isEmpty =>
            err("corpus", s"step $i: 'lang_filter' requires keepLangs[]")
          case "source_mix" if s.quota <= 0 =>
            err("corpus", s"step $i: 'source_mix' requires quota > 0")
          case "temp_mix" if s.quota <= 0 =>
            err("corpus", s"step $i: 'temp_mix' requires quota > 0 (the doc budget)")
          case "temp_mix" if s.alpha <= 0 || s.alpha > 1 =>
            err("corpus", s"step $i: 'temp_mix' requires alpha in (0, 1]")
          case "token_mix" if s.quota <= 0 =>
            err("corpus", s"step $i: 'token_mix' requires quota > 0 " +
              "(the TOKEN budget)")
          case "token_mix" if s.alpha <= 0 || s.alpha > 1 =>
            err("corpus", s"step $i: 'token_mix' requires alpha in (0, 1]")
          case "span_dedup" if s.window < 2 =>
            err("corpus", s"step $i: 'span_dedup' requires window >= 2")
          case "chunk" if s.window < 1 =>
            err("corpus", s"step $i: 'chunk' requires window >= 1 " +
              "(tokens per chunk)")
          case "chunk" if s.stride < 0 || s.stride > s.window =>
            err("corpus", s"step $i: 'chunk' requires 0 <= stride <= " +
              "window (0 means stride = window: no overlap)")
          case "curriculum" if s.tiers < 1 =>
            err("corpus", s"step $i: 'curriculum' requires tiers >= 1 " +
              "(difficulty bands)")
          case "span_scrub" if s.window < 2 =>
            err("corpus", s"step $i: 'span_scrub' requires window >= 2 " +
              "(the block size in tokens)")
          case "decontam" if s.evalSource.isEmpty =>
            err("corpus", s"step $i: 'decontam' requires evalSource " +
              "(scheme://path of the eval set to scrub against)")
          case "decontam" if s.threshold <= 0 || s.threshold > 1 =>
            err("corpus", s"step $i: 'decontam' requires threshold in " +
              "(0, 1] (the max tolerated eval-shingle overlap fraction)")
          case "semantic_decontam" if s.evalSource.isEmpty =>
            err("corpus", s"step $i: 'semantic_decontam' requires " +
              "evalSource (scheme://path of the eval EMBEDDINGS)")
          case "semantic_decontam" if s.vectorSource.isEmpty =>
            err("corpus", s"step $i: 'semantic_decontam' requires " +
              "vectorSource (scheme://path of the corpus embeddings, " +
              "vec_id keyed by the corpus id column)")
          case "semantic_decontam" if s.threshold <= 0 || s.threshold > 1 =>
            err("corpus", s"step $i: 'semantic_decontam' requires " +
              "threshold in (0, 1] (the max tolerated eval cosine)")
          case "dsir_sample" if s.keepLangs.isEmpty =>
            err("corpus", s"step $i: 'dsir_sample' requires keepLangs[] " +
              "(the target slice the importance weights are fit against)")
          case "ppl_gate" if s.threshold <= 0 || s.threshold > 1 =>
            err("corpus", s"step $i: 'ppl_gate' requires threshold in " +
              "(0, 1] (the fraction of lowest-perplexity docs to keep)")
          case "dedup_simhash" if s.maxHamming < 0 || s.maxHamming > 59 =>
            err("corpus", s"step $i: 'dedup_simhash' requires maxHamming " +
              "in [0, 59] (bits of a 60-bit signature; the band count is " +
              "derived as maxHamming + 1 so pigeonhole recall holds at " +
              "every radius)")
          case "rank_gate" if s.threshold <= 0 || s.threshold > 1 =>
            err("corpus", s"step $i: 'rank_gate' requires threshold in " +
              "(0, 1] (the per-group fraction of top-ranked docs to keep)")
          case "entropy_gate" if s.threshold <= 0 =>
            err("corpus", s"step $i: 'entropy_gate' requires threshold > 0 " +
              "(the minimum unigram entropy in bits)")
          case "model_gate" if s.keepLangs.isEmpty =>
            err("corpus", s"step $i: 'model_gate' requires keepLangs[] " +
              "(the trusted target-domain values of groupColumn the " +
              "classifier is fit against)")
          case "model_gate" if s.threshold <= 0 || s.threshold >= 1 =>
            err("corpus", s"step $i: 'model_gate' requires threshold in " +
              "(0, 1) (the minimum target-likeness probability)")
          case _ => ()
        }
        s.pairs.zipWithIndex.foreach { case (p, j) =>
          if (p.size != 2)
            err("corpus", s"step $i: pairs[$j] must be [regex, replacement]")
        }
      }
    }

    // pages
    if (c.numPages < 1)
      err("numPages", s"numPages must be >= 1, got ${c.numPages}")
    if (c.numPages > 1 && c.columns.page.isEmpty)
      err("numPages", "numPages > 1 requires columns.page")

    v.result()
  }

  /** Throw with every violation listed if the config is invalid. */
  def validateOrThrow(c: GraftConf): Unit = {
    val vs = validate(c)
    if (vs.nonEmpty)
      throw new IllegalArgumentException(
        s"invalid config (${vs.size} violations):\n  ${vs.mkString("\n  ")}")
  }

  // ------------------------------------------------ declarative field rules

  /** One field-level rule from `configChecks.json`
    * (ref: resources/configChecks.json + util/conf/ConfigValidator.scala —
    * same rule shape: path/pattern/range/canBeEmpty/datatype, optionally
    * gated by `withConditions` on other fields' values). The rule table is
    * DATA, so rule parity with the reference is diffable file-to-file. */
  final case class FieldRule(
      section: String, path: String, pattern: String, range: String,
      canBeEmpty: Boolean, datatype: String,
      conditions: Seq[(String, String)])

  /** The rule table, loaded once from the classpath resource. */
  lazy val fieldRules: Seq[FieldRule] = {
    import org.json4s._
    val text = {
      val in = getClass.getResourceAsStream("/configChecks.json")
      require(in != null, "configChecks.json missing from classpath")
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val root = org.json4s.jackson.JsonMethods.parse(text)
    for {
      JObject(sections) <- Seq(root)
      (section, body) <- sections
      JArray(rules) <- Seq(body \ "validationList")
      rule <- rules
    } yield {
      def str(k: String) = (rule \ k) match {
        case JString(s) => s; case _ => ""
      }
      val conds = (rule \ "withConditions") match {
        case JArray(cs) => cs.map(c => (
          (c \ "path").asInstanceOf[JString].s,
          (c \ "reqdValue").asInstanceOf[JString].s))
        case _ => Nil
      }
      FieldRule(section, str("path"), str("pattern"), str("range"),
        (rule \ "canBeEmpty") == JBool(true), str("datatype"), conds)
    }
  }

  /** Apply the declarative rule table to a RAW config JSON text (before
    * case-class defaulting, so absent-vs-present is observable). Returns
    * all violations; composes with the semantic [[validate]]. */
  def validateFields(rawJson: String): Seq[Violation] = {
    import org.json4s._
    val root = org.json4s.jackson.JsonMethods.parse(rawJson)
    def resolve(path: String): JValue =
      path.split('.').foldLeft(root)((j, k) => j \ k)
    def asText(j: JValue): Option[String] = j match {
      case JString(s) => Some(s)
      case JInt(i) => Some(i.toString)
      case JLong(l) => Some(l.toString)
      case JDouble(d) => Some(d.toString)
      case JBool(b) => Some(b.toString)
      case _ => None
    }
    def asNum(j: JValue): Option[Double] = j match {
      case JInt(i) => Some(i.toDouble)
      case JLong(l) => Some(l.toDouble)
      case JDouble(d) => Some(d)
      case JDecimal(d) => Some(d.toDouble)
      case _ => None
    }
    fieldRules.flatMap { r =>
      val active = r.conditions.forall { case (p, want) =>
        asText(resolve(p)).contains(want)
      }
      val value = resolve(r.path)
      val empty = value == JNothing || value == JNull ||
        value == JString("") || value == JObject(Nil) || value == JArray(Nil)
      if (!active) None
      else if (empty) {
        if (r.canBeEmpty) None
        else Some(Violation(r.section, s"${r.path} must be set"))
      } else {
        val typeOk = r.datatype match {
          case "string" => value.isInstanceOf[JString]
          case "int" => value.isInstanceOf[JInt] || value.isInstanceOf[JLong]
          case "boolean" => value.isInstanceOf[JBool]
          case "double" => asNum(value).isDefined
          case "object" => value.isInstanceOf[JObject]
          case _ => true
        }
        if (!typeOk)
          Some(Violation(r.section, s"${r.path} must be a ${r.datatype}"))
        else if (r.pattern.nonEmpty &&
                 asText(value).exists(!_.matches(r.pattern)))
          Some(Violation(r.section,
            s"${r.path} value '${asText(value).get}' does not match ${r.pattern}"))
        else if (r.range.nonEmpty) {
          val Array(lo, hi) = r.range.split('-').map(_.toDouble)
          asNum(value) match {
            case Some(n) if n < lo || n > hi =>
              Some(Violation(r.section, s"${r.path} must be in [$lo, $hi], got $n"))
            case _ => None
          }
        } else None
      }
    }
  }

  /** Field rules + semantic checks over raw JSON in one pass. */
  def validateAll(rawJson: String): Seq[Violation] =
    validateFields(rawJson) ++ validate(GraftConf.fromJson(rawJson))
}
