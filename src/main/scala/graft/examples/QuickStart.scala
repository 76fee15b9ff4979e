package graft.examples

import graft.{GraftSession, PipelineRunner}
import graft.config._
import graft.publish.{HotleadTransformer, Publish}

/** End-to-end drive of the config-driven pipeline over the testdata
  * `documents` table, through the [[PipelineRunner]] orchestrator: config
  * parse + validate → source read with a SQL view chain → random split →
  * text preprocessing chain → feature generation + vectorization → logistic
  * regression → scoring → AUROC metrics → combined-pipeline publish.
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
        |  "columns": {"response": "y", "text": ["text"], "numerical": ["n_chars"],
        |              "primaryKey": ["doc_id"]},
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
    println(s"[quickstart] config OK: ${conf.project.name}")

    val result = PipelineRunner.run(spark, conf, savepointing = true)
    val raw = graft.io.SourceReader.read(spark, conf.data, conf.columns)
    println(s"[quickstart] read ${raw.count()} rows, cols=${raw.columns.length}")
    println(s"[quickstart] vectorized; features col ready")
    println(f"[quickstart] AUROC train=${result.metrics("auroc_train")}%.4f " +
      f"test=${result.metrics("auroc_test")}%.4f")

    // publish: one PipelineModel from raw input to hotlead decision
    val page = result.pages.head
    val serving = Publish.combined(page.prep, page.chain, raw,
      Some(new HotleadTransformer().setDefaultThreshold(0.5)))
    val served = serving.transform(raw)
    println(s"[quickstart] published pipeline scored ${served.count()} raw rows; " +
      s"hotleads=${served.filter(org.apache.spark.sql.functions.col("isHotLead") === 1).count()}")
    println("[quickstart] sample predictions:")
    served.select("doc_id", "y", "prediction", "isHotLead").show(5, truncate = false)
    spark.stop()
  }
}
