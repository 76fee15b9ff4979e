package graft.features

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{IntParam, Param, ParamMap, StringArrayParam}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.{ArrayType, StringType, StructType}

/** Feature-generation transformers (ref: core/featuregeneration package).
  * All are pure Column-expression transforms (higher-order array functions →
  * whole-stage codegen, no UDFs), Array[String] in / Array[String] out.
  */

/** Skip-grams: for every window w in [3..windowSize], slide over the token
  * array and emit "first & last" AND-rule pairs
  * (ref: transformer/SkipGramGenerator.scala:28-46; guard w>=3 at 63-70). */
class SkipGramGenerator(override val uid: String)
    extends Transformer with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("skipGram"))
  final val inputCol = new Param[String](this, "inputCol", "token array column")
  final val outputCol = new Param[String](this, "outputCol", "skip-gram array column")
  final val windowSize = new IntParam(this, "windowSize", "max window (>= 3)")
  def setInputCol(v: String): this.type = set(inputCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  def setWindowSize(v: Int): this.type = { require(v >= 3, "skip-gram window must be >= 3"); set(windowSize, v) }

  override def transform(ds: Dataset[_]): DataFrame = {
    val toks = col($(inputCol))
    // for w in 3..W, for i in 0..n-w: token(i) + " & " + token(i+w-1);
    // when the doc is shorter than window w, emit no grams for that window
    // (sequence(0, n-w) would otherwise run descending)
    val grams = flatten(F.transform(
      sequence(lit(3), lit($(windowSize))),
      w => when(size(toks) >= w,
        F.transform(sequence(lit(0), size(toks) - w),
          i => concat(element_at(toks, i + 1), lit(" & "), element_at(toks, i + w))))
        .otherwise(array())))
    ds.withColumn($(outputCol),
      when(size(toks) >= 3, grams).otherwise(array().cast(ArrayType(StringType))))
  }
  override def transformSchema(schema: StructType): StructType =
    schema.add($(outputCol), ArrayType(StringType), nullable = true)
  override def copy(extra: ParamMap): Transformer = defaultCopy(extra)
}
object SkipGramGenerator extends DefaultParamsReadable[SkipGramGenerator]

/** Union of the base token array and every gram array into one feature
  * array (ref: transformer/GramAssembler.scala:33-35 — a struct UDF there;
  * here a single `concat` of array columns, codegen'd). */
class GramAssembler(override val uid: String)
    extends Transformer with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("gramAssemble"))
  final val inputCols = new StringArrayParam(this, "inputCols", "array columns to union")
  final val outputCol = new Param[String](this, "outputCol", "output array column")
  def setInputCols(v: Array[String]): this.type = set(inputCols, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  override def transform(ds: Dataset[_]): DataFrame =
    ds.withColumn($(outputCol),
      concat($(inputCols).toIndexedSeq.map(c => coalesce(col(c), array())): _*))
  override def transformSchema(schema: StructType): StructType =
    schema.add($(outputCol), ArrayType(StringType), nullable = true)
  override def copy(extra: ParamMap): Transformer = defaultCopy(extra)
}
object GramAssembler extends DefaultParamsReadable[GramAssembler]

/** Categorical columns → one Array[String] of `<col>_<value>` tokens, so
  * categorical levels vectorize through the same TF path as text and values
  * are unique across columns (ref: CategoricalColumnsTransformer.scala:31-33). */
class CategoricalAssembler(override val uid: String)
    extends Transformer with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("catAssemble"))
  final val inputCols = new StringArrayParam(this, "inputCols", "categorical columns")
  final val outputCol = new Param[String](this, "outputCol", "output array column")
  def setInputCols(v: Array[String]): this.type = set(inputCols, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  override def transform(ds: Dataset[_]): DataFrame =
    ds.withColumn($(outputCol),
      array($(inputCols).toIndexedSeq.map(c =>
        concat(lit(s"${c}_"), coalesce(col(c).cast("string"), lit("null")))): _*))
  override def transformSchema(schema: StructType): StructType =
    schema.add($(outputCol), ArrayType(StringType), nullable = false)
  override def copy(extra: ParamMap): Transformer = defaultCopy(extra)
}
object CategoricalAssembler extends DefaultParamsReadable[CategoricalAssembler]
