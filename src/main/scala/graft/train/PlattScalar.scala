package graft.train

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.param.{BooleanParam, DoubleArrayParam, Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Platt scaling: calibrate margin outputs (LinearSVC rawPrediction) into
  * probabilities by fitting a sigmoid p = σ(a·m + b) per class
  * (ref: org/apache/spark/ml/classification/PlattScalar.scala:33-505).
  *
  * Platt's soft targets t₊ = (N₊+1)/(N₊+2), t₋ = 1/(N₋+2) are trained here
  * via the weighted two-row identity — each example becomes (y=1, w=t) and
  * (y=0, w=1−t), which has EXACTLY the soft-label cross-entropy loss — so
  * stock LogisticRegression with weightCol replaces the reference's 762-line
  * BinaryLogisticRegressionWithDoubleResponse fork
  * (SURVEY §2.7 maps this as option (b); equivalence is exact in the loss).
  *
  * Multi-intent: one sigmoid per class on the OVR margin vector; transform
  * renames the estimator's argmax to `svm_prediction` and emits calibrated
  * `probability` + recomputed `prediction` (ref: PlattScalar.scala:142-236).
  * The fitted model carries only (a, b) doubles per class → transform is
  * pure Column arithmetic, fully codegen'd.
  */
class PlattScalar(override val uid: String) extends Estimator[PlattScalarModel] {
  def this() = this(Identifiable.randomUID("platt"))

  final val labelCol = new Param[String](this, "labelCol", "indexed label column")
  final val rawPredictionCol =
    new Param[String](this, "rawPredictionCol", "margin vector column")
  final val isMultiIntent = new BooleanParam(this, "isMultiIntent", "per-class sigmoids")
  setDefault(labelCol -> "label", rawPredictionCol -> "rawPrediction",
    isMultiIntent -> false)
  def setLabelCol(v: String): this.type = set(labelCol, v)
  def setRawPredictionCol(v: String): this.type = set(rawPredictionCol, v)
  def setIsMultiIntent(v: Boolean): this.type = set(isMultiIntent, v)

  /** Fit one sigmoid on (margin, binary target) with Platt soft targets. */
  private def fitSigmoid(df: DataFrame): (Double, Double) = {
    val counts = df.agg(
      sum(when(col("__t") === 1.0, 1L).otherwise(0L)),
      sum(when(col("__t") === 0.0, 1L).otherwise(0L))).head()
    val (nPos, nNeg) = (counts.getLong(0), counts.getLong(1))
    val tPos = (nPos + 1.0) / (nPos + 2.0)
    val tNeg = 1.0 / (nNeg + 2.0)
    val soft = df.withColumn("__target", when(col("__t") === 1.0, tPos).otherwise(tNeg))
      .select(col("__m"), explode(array(
        struct(lit(1.0).as("y"), col("__target").as("w")),
        struct(lit(0.0).as("y"), (lit(1.0) - col("__target")).as("w")))).as("r"))
      .select(array_to_vector(array(col("__m"))).as("features"),
        col("r.y").as("y"), col("r.w").as("w"))
    val lr = new LogisticRegression().setFeaturesCol("features").setLabelCol("y")
      .setWeightCol("w").setStandardization(false).setRegParam(0.0).setTol(1e-6)
    val m = lr.fit(soft)
    (m.coefficients(0), m.intercept)
  }

  override def fit(dataset: Dataset[_]): PlattScalarModel = {
    val raw = vector_to_array(col($(rawPredictionCol)))
    val numClasses =
      if ($(isMultiIntent))
        dataset.select(max(col($(labelCol)).cast("double"))).head().getDouble(0).toInt + 1
      else 2
    val coefs =
      if (!$(isMultiIntent)) {
        val df = dataset.select(element_at(raw, 2).as("__m"),
          when(col($(labelCol)) === 1.0, 1.0).otherwise(0.0).as("__t")).toDF()
        Array(fitSigmoid(df))
      } else {
        (0 until numClasses).map { k =>
          val df = dataset.select(element_at(raw, k + 1).as("__m"),
            when(col($(labelCol)) === k.toDouble, 1.0).otherwise(0.0).as("__t")).toDF()
          fitSigmoid(df)
        }.toArray
      }
    val m = new PlattScalarModel(uid).setCoefficients(coefs.map(_._1), coefs.map(_._2))
    copyValues(m).setParent(this)
  }

  override def transformSchema(schema: StructType): StructType =
    schema.add("probability", org.apache.spark.ml.linalg.SQLDataTypes.VectorType)
  override def copy(extra: ParamMap): PlattScalar = defaultCopy(extra)
}

/** The fitted sigmoids are (a, b) double arrays carried as Params, so the
  * model persists through DefaultParamsWritable like any built-in stage. */
class PlattScalarModel(override val uid: String)
    extends Model[PlattScalarModel] with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("plattModel"))

  final val labelCol = new Param[String](this, "labelCol", "indexed label column")
  final val rawPredictionCol =
    new Param[String](this, "rawPredictionCol", "margin vector column")
  final val isMultiIntent = new BooleanParam(this, "isMultiIntent", "per-class sigmoids")
  final val aCoef = new DoubleArrayParam(this, "aCoef", "sigmoid slope per class")
  final val bCoef = new DoubleArrayParam(this, "bCoef", "sigmoid intercept per class")
  setDefault(labelCol -> "label", rawPredictionCol -> "rawPrediction",
    isMultiIntent -> false)
  def setCoefficients(a: Array[Double], b: Array[Double]): this.type = {
    set(aCoef, a); set(bCoef, b)
  }
  def a: Array[Double] = $(aCoef)
  def b: Array[Double] = $(bCoef)

  override def transform(dataset: Dataset[_]): DataFrame = {
    val raw = vector_to_array(col($(rawPredictionCol)))
    def sigmoid(k: Int, marginIdx: Int) =
      lit(1.0) / (lit(1.0) + exp(-(lit(a(k)) * element_at(raw, marginIdx) + lit(b(k)))))
    if (a.length == 1) {
      val p1 = sigmoid(0, 2)
      dataset.withColumn("probability", array_to_vector(array(lit(1.0) - p1, p1)))
    } else {
      val probs = array(a.indices.map(k => sigmoid(k, k + 1)): _*)
      val df0 = dataset.toDF()
      val renamed =
        if (df0.columns.contains("prediction"))
          df0.withColumnRenamed("prediction", "svm_prediction")
        else df0
      renamed
        .withColumn("probability", array_to_vector(probs))
        .withColumn("prediction",
          (array_position(probs, array_max(probs)) - 1).cast("double"))
    }
  }

  override def transformSchema(schema: StructType): StructType =
    schema.add("probability", org.apache.spark.ml.linalg.SQLDataTypes.VectorType)
  override def copy(extra: ParamMap): PlattScalarModel =
    copyValues(new PlattScalarModel(uid), extra)
}
object PlattScalarModel extends DefaultParamsReadable[PlattScalarModel]
