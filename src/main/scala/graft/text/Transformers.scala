package graft.text

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{Param, ParamMap, StringArrayParam}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.{ArrayType, StringType, StructType}

/** Text preprocessing transformer pack (ref: core/preprocessing —
  * PreprocessingEngine.scala:206-541 and the transformer classes).
  *
  * Design departures from the reference:
  *  - Every transformer that CAN be a built-in Column expression IS one
  *    (lower/concat/filter/transform/regexp_replace) → whole-stage codegen,
  *    no UDF serde in the hot path. Only Porter stemming is a UDF (genuine
  *    per-token algorithm).
  *  - The reference's `~SP~` joined-string token convention is preserved:
  *    "tokenized" strings stay Strings joined by `~SP~`
  *    (ref: FlashMLConstants.scala:96), split on `delimiter|(~SP~)`.
  *  - All stages are spark.ml Transformers with param persistence, so fitted
  *    pipelines save/load like any PipelineModel.
  */
trait TextIOParams extends org.apache.spark.ml.param.Params {
  final val inputCol = new Param[String](this, "inputCol", "input column name")
  final val outputCol = new Param[String](this, "outputCol", "output column name")
  final val delimiter =
    new Param[String](this, "delimiter", "token delimiter regex (composed with ~SP~)")
  setDefault(delimiter, "\\s")
  def setInputCol(v: String): this.type = set(inputCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  def setDelimiter(v: String): this.type = set(delimiter, v)

  /** Reference token-split regex: user delimiter OR the ~SP~ marker
    * (ref: PreprocessingEngine.scala:281-283). */
  def splitRegex: String = $(delimiter) + "|(~SP~)"
  /** Canonical join marker for "tokenized" strings. */
  val joiner = "~SP~"
}

/** Base for String→String transformers expressed as one Column expression. */
abstract class StringExprTransformer(override val uid: String)
    extends Transformer with TextIOParams with DefaultParamsWritable {
  protected def outputExpr(in: Column): Column
  override def transform(ds: Dataset[_]): DataFrame =
    ds.withColumn($(outputCol), outputExpr(col($(inputCol))))
  override def transformSchema(schema: StructType): StructType = {
    require(schema.fieldNames.contains($(inputCol)), s"missing input column ${$(inputCol)}")
    if (schema.fieldNames.contains($(outputCol))) schema
    else schema.add($(outputCol), StringType, nullable = true)
  }
  override def copy(extra: ParamMap): Transformer = defaultCopy(extra)
}

/** lowercase (ref: CaseNormalizationTransformer.scala:14-42). */
class CaseNormalizer(override val uid: String) extends StringExprTransformer(uid) {
  def this() = this(Identifiable.randomUID("caseNorm"))
  protected def outputExpr(in: Column): Column = lower(in)
}
object CaseNormalizer extends DefaultParamsReadable[CaseNormalizer]

/** Wrap with sentence start/end markers (ref: SentenceMarker.scala:20-22). */
class SentenceMarker(override val uid: String) extends StringExprTransformer(uid) {
  def this() = this(Identifiable.randomUID("sentMark"))
  protected def outputExpr(in: Column): Column =
    concat(lit("_class_ss "), in, lit(" _class_se"))
}
object SentenceMarker extends DefaultParamsReadable[SentenceMarker]

/** String-in/String-out stopword removal
  * (ref: StopWordsRemoverCustom.scala:31-174). */
class StopWordsFilter(override val uid: String) extends StringExprTransformer(uid) {
  def this() = this(Identifiable.randomUID("stopFilter"))
  final val stopwords = new StringArrayParam(this, "stopwords", "tokens to drop")
  def setStopwords(v: Array[String]): this.type = set(stopwords, v)
  protected def outputExpr(in: Column): Column = {
    val stops = array($(stopwords).map(lit).toIndexedSeq: _*)
    array_join(
      filter(split(in, splitRegex), t => !array_contains(stops, t)), joiner)
  }
}
object StopWordsFilter extends DefaultParamsReadable[StopWordsFilter]

/** Dictionary token substitution; multi-word replacements allowed — they
  * re-split downstream because the split regex includes whitespace
  * (ref: WordSubstitutionTransformer.scala:57-62). */
class WordSubstitutor(override val uid: String) extends StringExprTransformer(uid) {
  def this() = this(Identifiable.randomUID("wordSub"))
  final val fromWords = new StringArrayParam(this, "fromWords", "tokens to replace")
  final val toWords = new StringArrayParam(this, "toWords", "replacement per token")
  def setDictionary(dict: Map[String, String]): this.type = {
    val (f, t) = dict.toSeq.sortBy(_._1).unzip
    set(fromWords, f.toArray); set(toWords, t.toArray)
  }
  protected def outputExpr(in: Column): Column = {
    val m = map($(fromWords).zip($(toWords)).toIndexedSeq
      .flatMap { case (f, t) => Seq(lit(f), lit(t)) }: _*)
    array_join(
      F.transform(split(in, splitRegex), t => coalesce(element_at(m, t), t)), joiner)
  }
}
object WordSubstitutor extends DefaultParamsReadable[WordSubstitutor]

/** Ordered regex→replacement rewriting; covers the reference's
  * word_classes_replacement (replacement `_class_<name>`), regex_replacement
  * and regex_removal config types
  * (ref: RegexReplacementTransformer.scala:67-73 — foldLeft replaceAllIn;
  * here a foldLeft of codegen'd regexp_replace calls). */
class RegexReplacer(override val uid: String) extends StringExprTransformer(uid) {
  def this() = this(Identifiable.randomUID("regexReplace"))
  /** Interleaved [regex1, repl1, regex2, repl2, ...] — order is semantic:
    * the reference applies longest-class-first (PreprocessingEngine.scala:395-401). */
  final val pairs = new StringArrayParam(this, "pairs", "interleaved regex,replacement pairs")
  def setPairs(ps: Seq[(String, String)]): this.type =
    set(pairs, ps.flatMap(p => Seq(p._1, p._2)).toArray)
  protected def outputExpr(in: Column): Column =
    $(pairs).grouped(2).foldLeft(in) {
      case (c, Array(re, repl)) => regexp_replace(c, re, repl)
      case (c, _) => c
    }
}
object RegexReplacer extends DefaultParamsReadable[RegexReplacer]

/** Porter stemming per token, skipping `_class_` markers and an exception
  * list (ref: PorterStemmingTransformer.scala:46-74). The one UDF in the
  * pack — an inherently procedural per-token algorithm. */
class PorterStemming(override val uid: String) extends StringExprTransformer(uid) {
  def this() = this(Identifiable.randomUID("porterStem"))
  final val exceptions = new StringArrayParam(this, "exceptions", "tokens never stemmed")
  setDefault(exceptions, Array.empty[String])
  def setExceptions(v: Array[String]): this.type = set(exceptions, v)
  protected def outputExpr(in: Column): Column = {
    val exc = $(exceptions).toSet
    val re = splitRegex
    val join = joiner
    val stemUdf = udf { (s: String) =>
      if (s == null) null
      else s.split(re).map { t =>
        if (t.isEmpty || t.startsWith("_class_") || exc(t)) t else PorterStemmer.stem(t)
      }.mkString(join)
    }
    stemUdf(in)
  }
}
object PorterStemming extends DefaultParamsReadable[PorterStemming]

/** Null imputation on one column with a type-directed cast of the fill
  * value, plus a 0/1 indicator column `imputed_<outputCol>`
  * (ref: ImputerCustom.scala:35-86 — spark's Imputer is numeric-mean only). */
class NullImputer(override val uid: String)
    extends Transformer with TextIOParams with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("nullImpute"))
  final val fillValue = new Param[String](this, "fillValue", "value cast to the column type")
  def setFillValue(v: String): this.type = set(fillValue, v)
  override def transform(ds: Dataset[_]): DataFrame = {
    val dt = ds.schema($(inputCol)).dataType
    val filled = coalesce(col($(inputCol)), lit($(fillValue)).cast(dt))
    ds.withColumn($(outputCol), filled)
      .withColumn(s"imputed_${$(outputCol)}",
        when(col($(inputCol)).isNull, 1).otherwise(0))
  }
  override def transformSchema(schema: StructType): StructType = {
    require(schema.fieldNames.contains($(inputCol)), s"missing input column ${$(inputCol)}")
    schema.add($(outputCol), schema($(inputCol)).dataType)
      .add(s"imputed_${$(outputCol)}", org.apache.spark.sql.types.IntegerType)
  }
  override def copy(extra: ParamMap): Transformer = defaultCopy(extra)
}
object NullImputer extends DefaultParamsReadable[NullImputer]

/** Terminal tokenizer: joined-string → Array[String] for gram/vectorization
  * stages (the reference uses RegexTokenizer here; this variant also splits
  * the ~SP~ marker convention). */
class TokenSplitter(override val uid: String)
    extends Transformer with TextIOParams with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("tokenSplit"))
  override def transform(ds: Dataset[_]): DataFrame =
    ds.withColumn($(outputCol),
      filter(split(col($(inputCol)), splitRegex), t => length(t) > 0))
  override def transformSchema(schema: StructType): StructType =
    schema.add($(outputCol), ArrayType(StringType), nullable = true)
  override def copy(extra: ParamMap): Transformer = defaultCopy(extra)
}
object TokenSplitter extends DefaultParamsReadable[TokenSplitter]
