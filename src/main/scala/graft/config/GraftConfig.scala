package graft.config

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Typed configuration model for the config-driven pipeline.
  *
  * Mirrors the semantics of the reference's JSON config surface
  * (ref: util/FlashMLConfig.scala, util/conf/FlashMLConstants.scala:8-299)
  * re-expressed as Scala case classes parsed with json4s (Spark's own JSON
  * stack — no extra dependency).
  *
  * Design: every section is optional with defaults; the [[ConfigValidator]]
  * enforces cross-section invariants before the pipeline runs.
  */
final case class ProjectConf(
    name: String = "graft",
    root: String = "/tmp/graft",
    retrainId: String = "r0")

/** Column roles (ref: ConfigValues.scala:63-101 — text / categorical /
  * numerical / response / page / primary key / date / random variable). */
final case class ColumnsConf(
    response: String = "label",
    text: Seq[String] = Nil,
    categorical: Seq[String] = Nil,
    numerical: Seq[String] = Nil,
    page: Option[String] = None,
    primaryKey: Seq[String] = Nil,
    dateVariable: Option[String] = None,
    randomVariable: Option[String] = None)

/** Data source + user SQL view chain (ref: dal/DataReader.scala:105-141).
  * `source` is `<format>://<path>` with format in parquet|csv|tsv|json,
  * or `views://` when `queries` fully defines the input from already-
  * registered temp views. */
final case class DataConf(
    source: String,
    queries: Seq[String] = Nil,
    customFilter: Option[String] = None,
    tempViewPrefix: String = "graftView",
    /** Monitoring mode's BASE snapshot (the reference's 4th entry point,
      * `experiment.type = monitoring`): `source` is the current data,
      * this the baseline it drifts against. Read with the same column
      * roles; required when running `graft.Main --monitor`. */
    monitorBaseSource: Option[String] = None)

/** Train/test sampling (ref: core/sampling/TrainTestSampler.scala:59-300). */
final case class SamplingConf(
    samplingType: String = "random", // random | conditional | stratified
    split: Seq[Double] = Seq(80, 20), // percentages, train first
    conditions: Seq[String] = Nil,    // for conditional: one filter per split
    seed: Long = 20L,
    minimumClassSupport: Long = 0L,   // rare-class stabilizer threshold
    otherClassValue: String = "other",
    rebalance: Option[RebalanceConf] = None)

final case class RebalanceConf(
    targetRatio: Double, // desired minority share after rebalance (0,1)
    mode: String = "undersample") // undersample | oversample

/** One preprocessing step on one input column (ref: PreprocessingEngine). */
final case class PreprocessStep(
    op: String,                    // tokenizer | case_normalization | stemming | ...
    inputColumn: String,
    outputColumn: Option[String] = None,
    pattern: Option[String] = None,        // tokenizer/regex ops
    replacements: Map[String, String] = Map.empty, // word substitution
    pairs: Seq[Seq[String]] = Nil,         // ordered (regex, replacement)
    stopwords: Seq[String] = Nil,
    exceptions: Seq[String] = Nil,         // stemming exception list
    value: Option[String] = None,          // imputer fill value
    /** Support file (ref: PreprocessingStageLoader): one token per line for
      * stopwords/exceptions; tab-separated `from<TAB>to` lines for
      * substitutions and regex pairs (regex_removal: regex only). Merged
      * AFTER the inline lists. */
    file: Option[String] = None)

final case class BinningConf(
    inputColumn: String,
    mode: String,               // equidistant | equiarea | intervals
    buckets: Int = 10,
    intervals: Seq[Double] = Nil)

final case class FeatureGenConf(
    ngrams: Seq[Int] = Nil,         // word n-gram sizes
    skipGramWindow: Int = 0,        // >=3 enables skip-grams
    gramInputColumn: Option[String] = None,
    binning: Seq[BinningConf] = Nil,
    /** Per-page binning (the reference's featuregeneration scope
      * "perPage": one binning list per page, fit on that page's train —
      * ref: FeatureGenerationEngine + binning_test_config.json). When
      * non-empty, entry k-1 overrides `binning` for page k; pages beyond
      * the list get no binning. */
    binningPerPage: Seq[Seq[BinningConf]] = Nil)

final case class VectorizationConf(
    method: String = "tfidf",   // hashingtf | count_vectorizer | word2vec | tfidf
    slots: Int = 4096,
    categoricalSlots: Option[Int] = None, // defaults to `slots`
    textColumn: Option[String] = None,
    assembleNumericals: Boolean = true)

final case class TrainingConf(
    algorithm: String = "logistic_regression",
    // lr/svm/dt/rf/gbt/nb/mlp hyper-params; unknown keys ignored by factory
    params: Map[String, Double] = Map.empty,
    buildType: String = "binary",    // binary | multi_intent | ovr
    seed: Long = 999L,
    /** MLP hidden-layer sizes (ref: "intermediateLayers"); input/output
      * widths are resolved from the data by the training engine. */
    hiddenLayers: Seq[Int] = Nil,
    plattScaling: Boolean = false,
    topK: Int = 0,
    uplift: Option[String] = None)   // treatment column

final case class TuningConf(
    method: String = "none",        // none | cv | hyperband
    folds: Int = 3,
    parallelism: Int = 3,
    evalMetric: String = "weightedPrecision",
    grid: Map[String, Seq[Double]] = Map.empty,
    maxHyperbandIter: Int = 81,
    eta: Int = 3,
    /** maxIter granted per unit of HyperBand resource
      * (ref: HyperBand.scala iterationMultiplier, default 20). */
    iterationMultiplier: Int = 20,
    /** maxIter for the winning config's final refit (ref:
      * maxIterationsFinalModel, default 1000 — size DOWN for tree
      * ensembles, where an iteration is a whole tree). */
    finalMaxIter: Int = 1000)

/** One corpus-cleaning step — the LLM-training-data pipeline's config
  * surface (the corpus twin of [[PreprocessStep]]). Ops compose in order;
  * each is a pure DataFrame transform from `queries.LlmData`/`text.*`
  * semantics. */
final case class CorpusStepConf(
    op: String,                     // dedup_exact | quality_gate | lang_filter |
                                    // token_bounds | pii_scrub | source_mix |
                                    // normalize | span_dedup | dsir_sample | ...
    keepLangs: Seq[String] = Nil,   // lang_filter: languages to keep
    langColumn: String = "lang",
    quota: Double = 0.0,            // source_mix: target docs per group
    groupColumn: String = "source", // source_mix: mixing group
    minTokens: Int = 5,             // quality_gate / token_bounds
    maxTokens: Int = 100000,
    threshold: Double = 0.7,        // dedup_minhash: verified-Jaccard floor;
                                    // span_dedup: max duplicated-span frac;
                                    // dsir_sample: min importance weight;
                                    // ppl_gate: lowest-ppl fraction kept
    window: Int = 8,                // span_dedup: words per span window;
                                    // chunk: tokens per chunk
    stride: Int = 0,                // chunk: start-to-start advance in
                                    // tokens (0 → = window: no overlap)
    maxHamming: Int = 3,            // dedup_simhash: Hamming radius (0-59)
    alpha: Double = 0.5,            // temp_mix: flattening temperature (α<1
                                    // upweights rare groups; quota = budget)
    evalSource: String = "",        // decontam: scheme://path of the eval
                                    // set (same text column as the corpus);
                                    // semantic_decontam: eval embeddings
                                    // (vec_id, embedding)
    vectorSource: String = "",      // semantic_decontam: corpus embeddings
                                    // (vec_id keyed by the corpus id col)
    pairs: Seq[Seq[String]] = Nil,  // pii_scrub: ordered [regex, class] overrides
    mediaColumn: String = "content", // exif_scrub: binary blob column
    tiers: Int = 10,                // curriculum: difficulty bands (shuffled
                                    // internally; ordered easy → hard)
    salt: String = "")              // curriculum: epoch re-deal salt — same
                                    // tiers, fresh in-tier permutation

final case class CorpusConf(
    steps: Seq[CorpusStepConf] = Nil,
    textColumn: String = "text",
    idColumn: String = "doc_id",
    weightColumn: String = "weight") // soft_dedup: attached 1/n_copies
                                     // column; mix steps consume it as
                                     // effective mass when present

final case class GraftConf(
    project: ProjectConf = ProjectConf(),
    data: DataConf,
    columns: ColumnsConf = ColumnsConf(),
    sampling: SamplingConf = SamplingConf(),
    preprocessing: Seq[PreprocessStep] = Nil,
    featureGeneration: FeatureGenConf = FeatureGenConf(),
    vectorization: VectorizationConf = VectorizationConf(),
    training: TrainingConf = TrainingConf(),
    tuning: TuningConf = TuningConf(),
    postPredictFilter: Option[String] = None,
    /** Corpus-cleaning mode (`graft.Main --corpus` / `CorpusRunner.run`):
      * when set, the data source is a document corpus and `steps` define
      * the cleaning chain instead of the ML pipeline. */
    corpus: Option[CorpusConf] = None,
    /** Page-level modelling: one model per page 1..numPages; the last page
      * accumulates `page >= numPages` (ref: PipelineSteps.scala:298-327). */
    numPages: Int = 1)

object GraftConf {
  private implicit val formats: Formats = DefaultFormats

  /** Parse a config from JSON text. Fails fast with a readable error. */
  def fromJson(json: String): GraftConf =
    JsonMethods.parse(json).extract[GraftConf]

  def fromFile(path: String): GraftConf =
    fromJson(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))
}
