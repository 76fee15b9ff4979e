package graft.text

import graft.config.PreprocessStep
import org.apache.spark.ml.PipelineStage
import org.apache.spark.ml.feature.RegexTokenizer

/** Builds a pipeline-stage chain from config preprocessing steps
  * (ref: core/preprocessing/PreprocessingEngine.scala:206-541).
  *
  * Intermediate columns are named `<input>_c<i>` per step index (the
  * reference uses `<in>_Col<i>_<MARKER>`); the final step writes the
  * declared output column (default `<input>_processed`).
  */
object PreprocessingEngine {

  def buildStages(steps: Seq[PreprocessStep]): Seq[PipelineStage] =
    steps.zipWithIndex.map { case (p, i) =>
      val out = p.outputColumn.getOrElse(s"${p.inputColumn}_c$i")
      stage(p, out)
    }

  /** Support-file loading (ref: core/preprocessing/PreprocessingStageLoader
    * .scala, which reads dictionaries from local disk OR HDFS): line-per-
    * token lists and tab-separated pair files, resolved through the Hadoop
    * FileSystem API — bare local paths, `file:/` and `hdfs://` URIs all
    * work, on a laptop or a cluster. Driver-side read — support files are
    * small config artifacts, never data. */
  private def fileLines(path: String): Seq[String] = {
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val p = new org.apache.hadoop.fs.Path(path)
    val in = p.getFileSystem(conf).open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toList
    finally in.close()
  }

  /** `from<TAB>to` or `from,to` per line (the reference's substitution
    * files are comma-separated — PreprocessingStageLoader.scala:282). */
  private def filePairs(path: String): Seq[Seq[String]] =
    fileLines(path).map { l =>
      val sep = if (l.contains('\t')) "\t" else ","
      l.split(sep, 2) match {
        case Array(a, b) => Seq(a, b)
        case Array(a) => Seq(a)
      }
    }

  private def tokens(inline: Seq[String], file: Option[String]): Seq[String] =
    inline ++ file.map(fileLines).getOrElse(Nil)

  private def pairs(p: PreprocessStep): Seq[Seq[String]] =
    p.pairs ++ p.file.map(filePairs).getOrElse(Nil)

  /** One config step → one Transformer (config name → class table,
    * SURVEY §2.4). */
  def stage(p: PreprocessStep, out: String): PipelineStage = p.op match {
    case "tokenizer" =>
      // the split pattern is composed with the ~SP~ joined-string marker so
      // tokenization undoes upstream String→String stages' joining
      // (ref: PreprocessingEngine.scala:281-283)
      new RegexTokenizer().setInputCol(p.inputColumn).setOutputCol(out)
        .setPattern(p.pattern.getOrElse("\\s") + "|(~SP~)").setToLowercase(false)
    case "case_normalization" =>
      new CaseNormalizer().setInputCol(p.inputColumn).setOutputCol(out)
    case "stemming" =>
      new PorterStemming().setInputCol(p.inputColumn).setOutputCol(out)
        .setExceptions(tokens(p.exceptions, p.file).toArray)
    case "contractions_replacement" | "lemma" =>
      val dict = p.replacements ++
        p.file.map(filePairs(_).collect { case Seq(a, b) => a -> b }.toMap)
          .getOrElse(Map.empty)
      new WordSubstitutor().setInputCol(p.inputColumn).setOutputCol(out)
        .setDictionary(dict)
    case "sentence_marker" =>
      new SentenceMarker().setInputCol(p.inputColumn).setOutputCol(out)
    case "stopwords" =>
      new StopWordsFilter().setInputCol(p.inputColumn).setOutputCol(out)
        .setStopwords(tokens(p.stopwords, p.file).toArray)
    case "nullcheck" =>
      new NullImputer().setInputCol(p.inputColumn).setOutputCol(out)
        .setFillValue(p.value.getOrElse(""))
    case "word_classes_replacement" =>
      // ordered longest-class-first like the reference
      // (PreprocessingEngine.scala:395-401); replacement is `_class_<name>`
      new RegexReplacer().setInputCol(p.inputColumn).setOutputCol(out)
        .setPairs(pairs(p).sortBy(-_.head.length)
          .map(pr => (pr(0), s"_class_${pr(1)}")))
    case "regex_replacement" =>
      new RegexReplacer().setInputCol(p.inputColumn).setOutputCol(out)
        .setPairs(pairs(p).map(pr => (pr(0), pr(1))))
    case "regex_removal" =>
      val ps =
        if (pairs(p).nonEmpty) pairs(p).map(pr => (pr.head, ""))
        else Seq((p.pattern.get, ""))
      new RegexReplacer().setInputCol(p.inputColumn).setOutputCol(out).setPairs(ps)
    case other => throw new IllegalArgumentException(s"unknown preprocessing op '$other'")
  }
}
