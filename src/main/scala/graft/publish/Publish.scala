package graft.publish

import graft.train.ModelTrainingEngine.FittedChain
import org.apache.spark.ml.{Pipeline, PipelineModel, Transformer}
import org.apache.spark.ml.util.MLWritable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Publish: stitch the fitted stages of every step into ONE serving
  * pipeline + QA data generation
  * (ref: publish/Publish.scala:60-205 generateSpark, 259-400 QA data).
  *
  * The MLeap bundle path is dropped (no Spark-4 support — SURVEY §2.9 [D]);
  * the JS codegen path is replaced by the Spark-native combined pipeline,
  * which serves the same purpose (a single artifact that scores raw input).
  */
object Publish {

  /** One PipelineModel that takes RAW input to scored output: preprocessing
    * + vectorization stages, the label indexer, the model chain, and an
    * optional hotlead stage.
    *
    * `Pipeline.fit` passes Transformer stages through unchanged (no refit) —
    * the standard way to assemble a PipelineModel from already-fitted
    * stages without private[ml] constructors. `sample` is only used for
    * schema propagation. */
  def combined(prep: PipelineModel, chain: FittedChain, sample: DataFrame,
               hotlead: Option[HotleadTransformer] = None): PipelineModel = {
    val stages: Array[Transformer] =
      (prep.stages.toSeq ++ Seq(chain.indexer) ++ chain.stages ++ hotlead.toSeq).toArray
    new Pipeline().setStages(stages.map(_.asInstanceOf[org.apache.spark.ml.PipelineStage]))
      .fit(sample.limit(1))
  }

  /** Save the combined model. Fails fast with the offending stage name if a
    * stage lacks persistence (all graft text/feature stages are
    * DefaultParamsWritable; Platt/uplift/top-k model stages are in-memory
    * scoring wrappers — publish those flows via savepointed scores). */
  def save(model: PipelineModel, path: String): Unit = {
    model.stages.collectFirst {
      case s if !s.isInstanceOf[MLWritable] => s.uid
    }.foreach(uid => throw new UnsupportedOperationException(
      s"stage $uid is not MLWritable — cannot persist this combined pipeline"))
    model.write.overwrite().save(path)
  }

  /** QA dataset: sample `n` visitors from the scored output and join their
    * RAW input rows with the scores, keyed on the primary key (+page)
    * (ref: Publish.scala:259-400 — there via a collected `isin` list; here
    * a broadcast equi-join of the sampled key set: same semantics, no
    * driver-side materialization, scales to any corpus).
    *
    * `orderBy(rand(seed))` runs on the DISTINCT key set (visitors), not the
    * fact table. */
  def qaData(raw: DataFrame, scored: DataFrame, primaryKey: Seq[String],
             scoreCols: Seq[String], n: Int, seed: Long): DataFrame = {
    val visitors = scored.select(primaryKey.map(col): _*).distinct()
      .orderBy(rand(seed)).limit(n)
    val keyedScores = scored.select((primaryKey ++ scoreCols).map(col): _*)
    raw.join(broadcast(visitors), primaryKey)
      .join(keyedScores, primaryKey)
  }
}
