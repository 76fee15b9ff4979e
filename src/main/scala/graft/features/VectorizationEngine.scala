package graft.features

import graft.config.{ColumnsConf, FeatureGenConf, VectorizationConf}
import org.apache.spark.ml.PipelineStage
import org.apache.spark.ml.feature._
import org.apache.spark.sql.DataFrame

/** Vectorization stage assembly (ref: core/VectorizationEngine.scala:88-233)
  * + the feature-generation driver (ref: FeatureGenerationEngine.scala:122-409).
  *
  * Text path: token array → {HashingTF | CountVectorizer | Word2Vec |
  * CountVectorizer→IDF}; categorical path: CategoricalAssembler tokens →
  * same method; numericals (+ binned columns) pass straight into the final
  * VectorAssembler. HashingTF at 100 TB is the stateless scale path (no
  * vocabulary shuffle); CountVectorizer/IDF fit one distributed pass.
  */
object VectorizationEngine {

  /** Gram stages for ONE token column: n-grams per size, optional
    * skip-grams, gram union. Returns (stages, final token column). */
  def gramStages(fg: FeatureGenConf, tokenCol: String): (Seq[PipelineStage], String) = {
    val stages = Seq.newBuilder[PipelineStage]
    val gramCols = Seq.newBuilder[String]
    fg.ngrams.foreach { n =>
      val out = s"${tokenCol}_${n}gram"
      stages += new NGram().setN(n).setInputCol(tokenCol).setOutputCol(out)
      gramCols += out
    }
    if (fg.skipGramWindow >= 3) {
      val out = s"${tokenCol}_skipgram"
      stages += new SkipGramGenerator().setInputCol(tokenCol)
        .setOutputCol(out).setWindowSize(fg.skipGramWindow)
      gramCols += out
    }
    val grams = gramCols.result()
    val finalTokens =
      if (grams.isEmpty) tokenCol
      else {
        val out = s"${tokenCol}_grams"
        stages += new GramAssembler().setInputCols((tokenCol +: grams).toArray).setOutputCol(out)
        out
      }
    (stages.result(), finalTokens)
  }

  /** One vectorization method over a token-array column → vector column. */
  def vectorizerStages(method: String, slots: Int,
                       inCol: String, outCol: String): Seq[PipelineStage] =
    method match {
      case "hashingtf" =>
        Seq(new HashingTF().setNumFeatures(slots).setInputCol(inCol).setOutputCol(outCol))
      case "count_vectorizer" =>
        Seq(new CountVectorizer().setVocabSize(slots).setInputCol(inCol).setOutputCol(outCol))
      case "word2vec" =>
        Seq(new Word2Vec().setVectorSize(slots).setInputCol(inCol).setOutputCol(outCol)
          .setSeed(999L))
      case "tfidf" =>
        val tf = s"${outCol}_tf"
        Seq(
          new CountVectorizer().setVocabSize(slots).setInputCol(inCol).setOutputCol(tf),
          new IDF().setInputCol(tf).setOutputCol(outCol))
      case other => throw new IllegalArgumentException(s"unknown vectorization method '$other'")
    }

  /** Full stage list: per-text-column grams + vectorization (one vector per
    * token column, like the reference's per-step text vectorization —
    * VectorizationEngine.scala:88-233), categorical vectorization, binning,
    * and the final VectorAssembler into `features` (uplift treatment column
    * goes LAST — the UpliftTransformer rewrites the final slot). */
  def buildStages(df: DataFrame, cols: ColumnsConf, fg: FeatureGenConf,
                  vec: VectorizationConf, tokenCols: Seq[String],
                  upliftTreatmentCol: Option[String] = None): Seq[PipelineStage] = {
    val stages = Seq.newBuilder[PipelineStage]
    val assembled = Seq.newBuilder[String]

    tokenCols.zipWithIndex.foreach { case (tc, i) =>
      val (gs, finalTokens) = gramStages(fg, tc)
      stages ++= gs
      val out = if (tokenCols.size <= 1) "text_vec" else s"text_vec_$i"
      stages ++= vectorizerStages(vec.method, vec.slots, finalTokens, out)
      assembled += out
    }
    if (cols.categorical.nonEmpty) {
      val out = "categorical_tokens"
      stages += new CategoricalAssembler()
        .setInputCols(cols.categorical.toArray).setOutputCol(out)
      stages ++= vectorizerStages(vec.method,
        vec.categoricalSlots.getOrElse(vec.slots), out, "cat_vec")
      assembled += "cat_vec"
    }
    fg.binning.foreach(b => stages += Binning.buildStage(df, b))
    if (vec.assembleNumericals) {
      assembled ++= cols.numerical.filterNot(n =>
        fg.binning.exists(_.inputColumn == n)) // binned cols replace raw
      assembled ++= fg.binning.map(b => Binning.outputName(b.inputColumn))
    }
    upliftTreatmentCol.foreach(assembled += _)
    stages += new VectorAssembler()
      .setInputCols(assembled.result().toArray).setOutputCol("features")
      .setHandleInvalid("keep")
    stages.result()
  }
}
