package graft.train

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.param.{IntParam, Param, ParamMap, StringArrayParam}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Top-k intents: zip StringIndexer labels with the probability vector,
  * sort by probability descending, keep k as Array[(label, score)]
  * (ref: org/apache/spark/ml/classification/TopKIntents.scala:95-105 — a
  * UDF there; here arrays_zip + sort_array + slice, pure codegen). */
class TopKIntents(override val uid: String)
    extends Transformer with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("topK"))

  final val labels = new StringArrayParam(this, "labels", "index → label strings")
  final val probabilityCol = new Param[String](this, "probabilityCol", "probability vector")
  final val outputCol = new Param[String](this, "outputCol", "top-k struct array")
  final val k = new IntParam(this, "k", "how many intents to keep")
  setDefault(probabilityCol -> "probability", outputCol -> "topIntents", k -> 3)
  def setLabels(v: Array[String]): this.type = set(labels, v)
  def setProbabilityCol(v: String): this.type = set(probabilityCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  def setK(v: Int): this.type = set(k, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    val labelArr = array($(labels).map(lit).toIndexedSeq: _*)
    val probs = vector_to_array(col($(probabilityCol)))
    // struct(score, label) sorts by score first; descending sort then
    // reshape to (label, score)
    val zipped = zip_with(probs, labelArr,
      (p, l) => struct(p.as("score"), l.as("label")))
    val top = slice(sort_array(zipped, asc = false), 1, $(k))
    ds.withColumn($(outputCol),
      F.transform(top, s => struct(s("label").as("label"), s("score").as("score"))))
  }

  override def transformSchema(schema: StructType): StructType =
    schema.add($(outputCol), ArrayType(StructType(Seq(
      StructField("label", StringType), StructField("score", DoubleType)))))
  override def copy(extra: ParamMap): Transformer = defaultCopy(extra)
}
object TopKIntents extends DefaultParamsReadable[TopKIntents]
