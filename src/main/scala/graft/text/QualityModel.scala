package graft.text

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, Tokenizer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the CCNet / GPT-3 / LLaMA corpus gate
  * (the classifier-filter stage the published pipelines run after the
  * heuristic gates): fit a LINEAR classifier that separates a small
  * trusted "target domain" slice from the rest of the corpus, score every
  * document with it, and keep the documents that *look like* the target.
  * Heuristics ([[TextQuality]]) catch degenerate text; the model catches
  * fluent-but-off-domain text the heuristics cannot.
  *
  * Architecture is deliberately fastText-shaped but Spark-native: a
  * Tokenizer → HashingTF bag-of-words (sparse, fixed 2^18 dims — no
  * vocabulary broadcast, no fit pass over the corpus for the featurizer)
  * → LogisticRegression with a fixed seed. Training touches only the
  * seed slice + an equal-size deterministic negative sample; SCORING is
  * the corpus-wide pass and is embarrassingly parallel — one sparse dot
  * product per document, no shuffle, the same cost profile as the
  * row-local heuristic gates. At 100 TB the model (2^18 doubles ≈ 2 MB)
  * ships to executors as a task binary once.
  */
object QualityModel {

  /** Fit the target-vs-rest classifier. Positives: rows where
    * `targetCol` ∈ `targetValues`. Negatives: a deterministic md5-coin
    * sample of the rest, sized ≈ the positive count (balanced classes —
    * class weights would also work; the sample keeps the train set small
    * and the coin keeps it reproducible). */
  def fit(docs: DataFrame, textCol: String, targetCol: String,
          targetValues: Seq[String], idCol: String = "doc_id",
          numFeatures: Int = 1 << 18): PipelineModel = {
    val isTarget = col(targetCol).isin(targetValues.map(v => v: Any): _*)
    val pos = docs.filter(isTarget)
    val rest = docs.filter(!isTarget)
    // one pass for both class counts (a 100 TB corpus is scanned once,
    // not twice)
    val counts = docs.agg(
      sum(when(isTarget, 1L).otherwise(0L)).as("np"),
      count(lit(1)).as("n")).collect()(0)
    val nPos = Option(counts.get(0)).fold(0L)(_.asInstanceOf[Long])
    // the config validator can only check the CONFIG; an empty target
    // slice in the DATA must fail here with an actionable message, not
    // as an opaque MLlib error on an empty training set
    require(nPos > 0,
      s"model_gate: no rows match targetValues ${targetValues.mkString("[", ",", "]")} " +
        s"in column '$targetCol' — the target-domain seed slice is empty")
    val nRest = math.max(1L, counts.getLong(1) - nPos)
    val frac = math.min(1.0, nPos.toDouble / nRest)
    // deterministic Bernoulli coin on the id — reproducible across runs
    // and engines, unlike sample()'s partition-dependent RNG
    val coin = graft.functions.GraftFunctions.md5Coin(col(idCol))
    val neg = rest.filter(coin < lit(frac))
    val train = pos.withColumn("label", lit(1.0))
      .unionByName(neg.withColumn("label", lit(0.0)))
      .select(col(idCol), col(textCol), col("label"))
    val pipeline = new Pipeline().setStages(Array(
      new Tokenizer().setInputCol(textCol).setOutputCol("__qm_toks"),
      new HashingTF().setInputCol("__qm_toks").setOutputCol("__qm_feat")
        .setNumFeatures(numFeatures),
      new LogisticRegression().setFeaturesCol("__qm_feat")
        .setLabelCol("label").setMaxIter(25).setRegParam(0.01)
        .setStandardization(false)
        // every transform-time output column lives under the reserved
        // __qm_ prefix: scoring must never collide with (or silently
        // drop) caller columns named prediction/probability/label —
        // gates FILTER, they never mutate the caller's schema
        .setPredictionCol("__qm_pred")
        .setProbabilityCol("__qm_prob")
        .setRawPredictionCol("__qm_raw")))
    pipeline.fit(train)
  }

  /** Score every document: adds `quality_p` = P(target-like). One
    * row-local sparse dot per doc — no shuffle, corpus-scan cost. All
    * intermediates are `__qm_`-prefixed (and no label column is needed
    * at transform time), so the caller's schema passes through intact —
    * a corpus that already has `label`/`prediction` columns keeps them. */
  def scoreAll(model: PipelineModel, docs: DataFrame,
               textCol: String): DataFrame = {
    require(!docs.columns.exists(c => c.startsWith("__qm_") || c == "quality_p"),
      "scoreAll: input must not contain __qm_* or quality_p columns (reserved)")
    val p1 = element_at(vector_to_array(col("__qm_prob")), 2)
    model.transform(docs)
      .withColumn("quality_p", round(p1, 6))
      .drop("__qm_toks", "__qm_feat", "__qm_prob", "__qm_raw", "__qm_pred")
  }

  private def vector_to_array(c: org.apache.spark.sql.Column) =
    org.apache.spark.ml.functions.vector_to_array(c)

  /** Fit + score + gate in one call — what the `model_gate` corpus step
    * runs: keep documents with quality_p ≥ threshold OR in the target
    * slice itself (the seed domain is trusted by construction). */
  def gate(docs: DataFrame, textCol: String, targetCol: String,
           targetValues: Seq[String], threshold: Double,
           idCol: String = "doc_id"): DataFrame = {
    val model = fit(docs, textCol, targetCol, targetValues, idCol)
    val isTarget = col(targetCol).isin(targetValues.map(v => v: Any): _*)
    scoreAll(model, docs, textCol)
      .filter(isTarget || col("quality_p") >= threshold)
      .drop("quality_p")
  }
}
