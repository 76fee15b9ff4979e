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

  /** One config step → one Transformer (config name → class table,
    * SURVEY §2.4). */
  def stage(p: PreprocessStep, out: String): PipelineStage = p.op match {
    case "tokenizer" =>
      new RegexTokenizer().setInputCol(p.inputColumn).setOutputCol(out)
        .setPattern(p.pattern.getOrElse("\\s+")).setToLowercase(false)
    case "case_normalization" =>
      new CaseNormalizer().setInputCol(p.inputColumn).setOutputCol(out)
    case "stemming" =>
      new PorterStemming().setInputCol(p.inputColumn).setOutputCol(out)
        .setExceptions(p.exceptions.toArray)
    case "contractions_replacement" | "lemma" =>
      new WordSubstitutor().setInputCol(p.inputColumn).setOutputCol(out)
        .setDictionary(p.replacements)
    case "sentence_marker" =>
      new SentenceMarker().setInputCol(p.inputColumn).setOutputCol(out)
    case "stopwords" =>
      new StopWordsFilter().setInputCol(p.inputColumn).setOutputCol(out)
        .setStopwords(p.stopwords.toArray)
    case "nullcheck" =>
      new NullImputer().setInputCol(p.inputColumn).setOutputCol(out)
        .setFillValue(p.value.getOrElse(""))
    case "word_classes_replacement" =>
      // ordered longest-class-first like the reference
      // (PreprocessingEngine.scala:395-401); replacement is `_class_<name>`
      new RegexReplacer().setInputCol(p.inputColumn).setOutputCol(out)
        .setPairs(p.pairs.sortBy(-_.head.length)
          .map(pr => (pr(0), s"_class_${pr(1)}")))
    case "regex_replacement" =>
      new RegexReplacer().setInputCol(p.inputColumn).setOutputCol(out)
        .setPairs(p.pairs.map(pr => (pr(0), pr(1))))
    case "regex_removal" =>
      val ps = if (p.pairs.nonEmpty) p.pairs.map(pr => (pr.head, ""))
               else Seq((p.pattern.get, ""))
      new RegexReplacer().setInputCol(p.inputColumn).setOutputCol(out).setPairs(ps)
    case other => throw new IllegalArgumentException(s"unknown preprocessing op '$other'")
  }
}
