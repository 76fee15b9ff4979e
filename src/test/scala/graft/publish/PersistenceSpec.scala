package graft.publish

import graft.SparkSpec
import graft.config.{TrainingConf, TuningConf}
import graft.train.ModelTrainingEngine
import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** PipelineModel persistence round-trips (SURVEY §2.1 "Pipeline
  * persistence" — ref: core/Engine.scala:39-87): every graft text/feature
  * stage and the Platt-calibrated model chain save and load through the
  * standard spark.ml writer. */
class PersistenceSpec extends SparkSpec {
  import spark.implicits._

  behavior of "pipeline persistence"

  it should "round-trip a preprocessing+vectorization pipeline" in {
    import graft.config.PreprocessStep
    val steps = Seq(
      PreprocessStep(op = "case_normalization", inputColumn = "text", outputColumn = Some("t1")),
      PreprocessStep(op = "stopwords", inputColumn = "t1", outputColumn = Some("t2"),
        stopwords = Seq("the")),
      PreprocessStep(op = "stemming", inputColumn = "t2", outputColumn = Some("t3")),
      PreprocessStep(op = "tokenizer", inputColumn = "t3", outputColumn = Some("toks")))
    val df = Seq("The Running Dogs", "fast CATS jumped").toDF("text")
    val stages = graft.text.PreprocessingEngine.buildStages(steps) ++
      graft.features.VectorizationEngine.vectorizerStages("tfidf", 64, "toks", "text_vec")
    val fitted = new Pipeline().setStages(stages.toArray).fit(df)
    val path = Files.createTempDirectory("graft-prep").resolve("m").toString
    fitted.write.overwrite().save(path)
    val loaded = PipelineModel.load(path)
    val a = fitted.transform(df).select("t3").as[String].collect().toSeq
    val b = loaded.transform(df).select("t3").as[String].collect().toSeq
    a shouldBe b
  }

  it should "round-trip a Platt-calibrated SVM serving pipeline" in {
    val rnd = new scala.util.Random(7)
    val df = (0 until 100).flatMap { _ =>
      Seq((org.apache.spark.ml.linalg.Vectors.dense(rnd.nextGaussian() - 2.0), "no"),
        (org.apache.spark.ml.linalg.Vectors.dense(rnd.nextGaussian() + 2.0), "yes"))
    }.toDF("features", "y")
    val chain = ModelTrainingEngine.fit(df,
      TrainingConf(algorithm = "svm", plattScaling = true, topK = 0),
      TuningConf(), "y")
    val serving = Publish.combined(
      new Pipeline().setStages(Array.empty[org.apache.spark.ml.PipelineStage]).fit(df),
      chain, df,
      Some(new HotleadTransformer().setDefaultThreshold(0.5)))
    val path = Files.createTempDirectory("graft-serve").resolve("m").toString
    Publish.save(serving, path)
    val loaded = PipelineModel.load(path)
    val a = serving.transform(df).select("isHotLead").as[Int].collect().toSeq
    val b = loaded.transform(df).select("isHotLead").as[Int].collect().toSeq
    a shouldBe b
    b.toSet should be(Set(0, 1)) // both classes present on separable data
  }
}
