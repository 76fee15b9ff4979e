package graft.publish

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.param.{DoubleParam, Param, ParamMap, StringArrayParam}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructType}

/** Pipeline-stage form of the hotlead threshold rule: a row is a hotlead
  * when its positive-class probability clears the page's threshold
  * (ref: publish/transformer/HotleadTransformer.scala, wired in
  * Publish.scala:68-90). Emits `isHotLead` (0/1).
  *
  * Thresholds are carried as interleaved ["page", "thr", ...] string pairs
  * so the stage persists via DefaultParamsWritable like every other stage;
  * the rule itself is one codegen'd CASE expression — no UDF.
  */
class HotleadTransformer(override val uid: String)
    extends Transformer with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("hotlead"))

  final val probabilityCol =
    new Param[String](this, "probabilityCol", "probability vector column")
  final val pageCol = new Param[String](this, "pageCol", "page column ('' = none)")
  final val defaultThreshold =
    new DoubleParam(this, "defaultThreshold", "threshold for unlisted pages")
  final val pageThresholds = new StringArrayParam(this, "pageThresholds",
    "interleaved page,threshold string pairs")
  /** Second gate of the reference rule: time-on-page ≥ its own per-page
    * threshold ('' = gate disabled). */
  final val topCol = new Param[String](this, "topCol", "time-on-page column ('' = none)")
  final val defaultTopThreshold =
    new DoubleParam(this, "defaultTopThreshold", "TOP threshold for unlisted pages")
  final val topThresholds = new StringArrayParam(this, "topThresholds",
    "interleaved page,TOP-threshold string pairs")
  setDefault(probabilityCol -> "probability", pageCol -> "",
    defaultThreshold -> 0.5, pageThresholds -> Array.empty[String],
    topCol -> "", defaultTopThreshold -> 0.0, topThresholds -> Array.empty[String])
  def setProbabilityCol(v: String): this.type = set(probabilityCol, v)
  def setPageCol(v: String): this.type = set(pageCol, v)
  def setDefaultThreshold(v: Double): this.type = set(defaultThreshold, v)
  def setPageThresholds(m: Map[Int, Double]): this.type =
    set(pageThresholds, m.toSeq.sortBy(_._1)
      .flatMap { case (p, t) => Seq(p.toString, t.toString) }.toArray)
  def setTopCol(v: String): this.type = set(topCol, v)
  def setDefaultTopThreshold(v: Double): this.type = set(defaultTopThreshold, v)
  def setTopThresholds(m: Map[Int, Double]): this.type =
    set(topThresholds, m.toSeq.sortBy(_._1)
      .flatMap { case (p, t) => Seq(p.toString, t.toString) }.toArray)

  private def perPage(pairs: Array[String], default: Double) =
    pairs.grouped(2).foldLeft(lit(default)) {
      case (acc, Array(page, t)) if $(pageCol).nonEmpty =>
        when(col($(pageCol)) === page.toInt, t.toDouble).otherwise(acc)
      case (acc, _) => acc
    }

  override def transform(ds: Dataset[_]): DataFrame = {
    val p = element_at(vector_to_array(col($(probabilityCol))), 2)
    val probGate = p >= perPage($(pageThresholds), $(defaultThreshold))
    val gate =
      if ($(topCol).isEmpty) probGate
      else probGate && col($(topCol)) >= perPage($(topThresholds), $(defaultTopThreshold))
    ds.withColumn("isHotLead", gate.cast("int"))
  }

  override def transformSchema(schema: StructType): StructType =
    schema.add("isHotLead", IntegerType, nullable = false)
  override def copy(extra: ParamMap): Transformer = defaultCopy(extra)
}
object HotleadTransformer extends DefaultParamsReadable[HotleadTransformer]
