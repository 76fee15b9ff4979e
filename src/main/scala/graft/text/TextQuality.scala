package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document quality scoring for training-data pipelines: cheap, row-local
  * heuristics (length, token shape, stopword share, symbol share) that
  * compose into a keep/drop gate. Everything is a built-in expression —
  * codegen'd, no shuffle, safe to run inline in a 100 TB ingest scan.
  *
  * The thresholds follow the common published heuristics (e.g. the
  * C4/Gopher-style filters): minimum length, mean-word-length band,
  * stopword floor, symbol ceiling.
  */
object TextQuality {

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "is", "in", "to")

  /** Per-document quality features as named Columns over `textCol`. */
  def features(textCol: String): Seq[(String, Column)] = {
    val toks = split(col(textCol), " ")
    val nTok = size(toks)
    val meanLen = aggregate(F_transform(toks), lit(0), (a, x) => a + x)
      .cast("double") / nTok
    val stopRatio = size(filter(toks,
      t => t.isin(stopwords.map(s => s: Any): _*))).cast("double") / nTok
    val symbolRatio =
      (length(col(textCol)) - length(regexp_replace(col(textCol), "[^a-zA-Z0-9 ]", "")))
        .cast("double") / length(col(textCol))
    Seq(
      "n_tokens" -> nTok.cast("long"),
      "mean_tok_len" -> meanLen,
      "stop_ratio" -> stopRatio,
      "symbol_ratio" -> symbolRatio)
  }

  private def F_transform(toks: Column) =
    org.apache.spark.sql.functions.transform(toks, x => length(x))

  /** The keep gate: true when every heuristic passes. */
  def keep(textCol: String,
           minTokens: Int = 5, maxTokens: Int = 100000,
           minMeanLen: Double = 2.0, maxMeanLen: Double = 12.0,
           minStopRatio: Double = 0.01, maxSymbolRatio: Double = 0.2): Column = {
    val f = features(textCol).toMap
    f("n_tokens").between(minTokens, maxTokens) &&
      f("mean_tok_len").between(minMeanLen, maxMeanLen) &&
      (f("stop_ratio") >= minStopRatio) &&
      (f("symbol_ratio") <= maxSymbolRatio)
  }

  /** Score + gate every document (adds the feature columns and `keep`). */
  def score(df: DataFrame, textCol: String): DataFrame = {
    val withFeatures = features(textCol).foldLeft(df) {
      case (acc, (name, c)) => acc.withColumn(name, c)
    }
    withFeatures.withColumn("keep", keep(textCol).cast("int"))
  }
}
