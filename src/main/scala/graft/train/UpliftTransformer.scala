package graft.train

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.classification.ClassificationModel
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.{Param, ParamMap}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.StructType

/** Uplift scoring: score every row twice with the treatment feature (the
  * LAST slot of the feature vector, by the VectorizationEngine contract)
  * forced to 0 and then 1; uplift Δ = p₁ − p₀ is packed as probability
  * [1−Δ, Δ] with a logit rawPrediction
  * (ref: org/apache/spark/ml/classification/UpliftTransformer.scala:74-157;
  * slot-rewrite UDFs at 96-107 — here vector_to_array / transform /
  * array_to_vector builtins).
  *
  * Optionally calibrates each pass through a fitted [[PlattScalarModel]]
  * (the reference does this for SVM base models).
  */
class UpliftTransformer(override val uid: String) extends Transformer {
  def this() = this(Identifiable.randomUID("uplift"))

  final val featuresCol = new Param[String](this, "featuresCol", "feature vector column")
  setDefault(featuresCol -> "features")
  def setFeaturesCol(v: String): this.type = set(featuresCol, v)

  private var baseModel: ClassificationModel[Vector, _] = _
  private var platt: Option[PlattScalarModel] = None
  def setBaseModel(m: ClassificationModel[Vector, _]): this.type = { baseModel = m; this }
  def setPlattModel(m: PlattScalarModel): this.type = { platt = Some(m); this }

  /** p(positive) for one forced treatment value, as a Column pipeline. */
  private def scoreWith(df: DataFrame, forced: Double, outCol: String): DataFrame = {
    // Replace the LAST slot via slice+concat — O(d) per row. A
    // transform((x, i) => when(i === size(arr)-1, ...)) lambda would
    // re-evaluate size(vector_to_array(...)) per ELEMENT (the interpreted
    // path inlines the subexpression), turning scoring into O(d²) per row
    // — minutes instead of seconds at 5k feature slots.
    val arr = vector_to_array(col($(featuresCol)))
    val rewritten = array_to_vector(
      concat(slice(arr, lit(1), size(arr) - 1), array(lit(forced))))
    val in = df.withColumn("__uplift_feat", rewritten)
    val m = baseModel.copy(ParamMap.empty).asInstanceOf[ClassificationModel[Vector, _]]
    m.set(m.getParam("featuresCol"), "__uplift_feat")
    m.set(m.getParam("rawPredictionCol"), "__uplift_raw")
    m.set(m.getParam("predictionCol"), "__uplift_pred")
    m.params.find(_.name == "probabilityCol")
      .foreach(p => m.set(p.asInstanceOf[Param[String]], "__uplift_prob"))
    val scored = m.transform(in)
    val withProb = platt match {
      case Some(pl) =>
        val plc = pl.copy(ParamMap.empty)
        plc.set(plc.rawPredictionCol, "__uplift_raw")
        plc.transform(scored.drop("__uplift_prob"))
          .withColumnRenamed("probability", "__uplift_prob")
      case None => scored
    }
    withProb
      .withColumn(outCol, element_at(vector_to_array(col("__uplift_prob")), 2))
      .drop("__uplift_feat", "__uplift_raw", "__uplift_pred", "__uplift_prob")
  }

  override def transform(dataset: Dataset[_]): DataFrame = {
    // the base model's outputs become the model* columns (ref:
    // UpliftTransformer.scala:143-150 renames). As a pipeline stage the
    // incoming frame is already scored by the base model — rename in place;
    // standalone use scores one base pass first.
    val df0 = dataset.toDF()
    val scoredBase =
      if (df0.columns.contains("rawPrediction")) df0
      else {
        val base = baseModel.copy(ParamMap.empty).asInstanceOf[ClassificationModel[Vector, _]]
        base.set(base.getParam("featuresCol"), $(featuresCol))
        base.transform(df0)
      }
    val renamed = Seq("probability", "prediction", "rawPrediction")
      .foldLeft(scoredBase)((df, c) =>
        if (df.columns.contains(c)) df.withColumnRenamed(c, s"model${c.capitalize}") else df)
    val p0 = scoreWith(renamed, 0.0, "__p0")
    val p1 = scoreWith(p0, 1.0, "__p1")
    val delta = col("__p1") - col("__p0")
    // SQL log(x≤0) is NULL; mirror scala.math.log double semantics (NaN /
    // ±Inf) so the packed vector never sees a null
    val ratio = F.try_divide(lit(1.0), delta) - 1.0 // null at Δ=0 (ANSI-safe)
    val logit = when(ratio > 0.0, F.log(ratio))
      .when(ratio === 0.0, lit(Double.NegativeInfinity))
      .when(ratio.isNull, lit(Double.PositiveInfinity)) // Δ=0 ⇒ 1/Δ−1 → +∞
      .otherwise(lit(Double.NaN))
    p1
      .withColumn("probability", array_to_vector(array(lit(1.0) - delta, delta)))
      .withColumn("rawPrediction", array_to_vector(array(-logit, logit)))
      .drop("__p0", "__p1")
  }

  override def transformSchema(schema: StructType): StructType =
    schema.add("probability", org.apache.spark.ml.linalg.SQLDataTypes.VectorType)
  override def copy(extra: ParamMap): Transformer = {
    val t = new UpliftTransformer(uid)
    t.baseModel = baseModel; t.platt = platt
    copyValues(t, extra)
  }
}
