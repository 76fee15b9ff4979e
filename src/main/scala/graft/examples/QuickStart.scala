package graft.examples

import graft.GraftSession
import graft.config._
import graft.io.SourceReader
import graft.sampling.TrainTestSampler
import graft.text.PreprocessingEngine
import graft.features.VectorizationEngine
import graft.train.ModelTrainingEngine
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.sql.functions._

/** End-to-end smoke drive of the config-driven ML pipeline over the
  * testdata `documents` table: config parse + validate → source read with a
  * SQL view chain → random split → text preprocessing chain → feature
  * generation + vectorization → logistic regression → AUROC.
  *
  * Run: sbt "runMain graft.examples.QuickStart /root/testdata/sf0.01"
  */
object QuickStart {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local(8, "graft-quickstart")

    val confJson =
      s"""{
        |  "project": {"name": "quickstart", "root": "/tmp/graft-demo"},
        |  "data": {
        |    "source": "parquet://$dir/documents.parquet",
        |    "queries": ["SELECT *, CASE WHEN lang = 'en' THEN 'pos' ELSE 'neg' END AS y FROM graftView0"]
        |  },
        |  "columns": {"response": "y", "text": ["text"], "numerical": ["n_chars"]},
        |  "sampling": {"samplingType": "random", "split": [80, 20], "seed": 20},
        |  "preprocessing": [
        |    {"op": "case_normalization", "inputColumn": "text", "outputColumn": "t_lower"},
        |    {"op": "stopwords", "inputColumn": "t_lower", "outputColumn": "t_stop", "stopwords": ["the", "a"]},
        |    {"op": "stemming", "inputColumn": "t_stop", "outputColumn": "t_stem"},
        |    {"op": "tokenizer", "inputColumn": "t_stem", "outputColumn": "tokens"}
        |  ],
        |  "featureGeneration": {"ngrams": [2]},
        |  "vectorization": {"method": "tfidf", "slots": 2048},
        |  "training": {"algorithm": "logistic_regression", "buildType": "binary"}
        |}""".stripMargin

    val conf = GraftConf.fromJson(confJson)
    ConfigValidator.validateOrThrow(conf)
    println(s"[quickstart] config OK: ${conf.project.name}")

    val df = SourceReader.read(spark, conf.data, conf.columns)
    println(s"[quickstart] read ${df.count()} rows, cols=${df.columns.length}")

    val Seq(train, test) =
      TrainTestSampler.sample(df, conf.sampling, conf.columns.response)
    println(s"[quickstart] split train=${train.count()} test=${test.count()}")

    val preStages = PreprocessingEngine.buildStages(conf.preprocessing)
    val vecStages = VectorizationEngine.buildStages(
      train, conf.columns, conf.featureGeneration, conf.vectorization, Some("tokens"))
    val prep = new Pipeline().setStages((preStages ++ vecStages).toArray).fit(train)
    val trainVec = prep.transform(train)
    val testVec = prep.transform(test)
    println(s"[quickstart] vectorized; features col ready")

    val chain = ModelTrainingEngine.fit(trainVec, conf.training, conf.tuning,
      conf.columns.response)
    val scoredTrain = chain.transform(trainVec)
    val scoredTest = chain.transform(testVec)
    val auroc = new BinaryClassificationEvaluator().setLabelCol("label")
    println(f"[quickstart] AUROC train=${auroc.evaluate(scoredTrain)}%.4f " +
      f"test=${auroc.evaluate(scoredTest)}%.4f")
    println("[quickstart] sample predictions:")
    scoredTest.select("doc_id", "y", "label", "prediction").show(5, truncate = false)
    spark.stop()
  }
}
