package graft.examples

import graft.{CorpusRunner, GraftSession, PipelineRunner}
import graft.config.GraftConf

/** The full engine story in one run: curate a raw corpus with the
  * training-data pipeline, savepoint the cleaned frame, then train a
  * config-driven classifier ON the curated output — the handoff a
  * pretraining-data team and a modeling team would run at 100 TB, where
  * the curation savepoint is the contract between the two jobs.
  *
  * Stage 1 (CorpusRunner): dedup → span gate → quality gate → temperature-
  * flattened source mixing, savepointed as parquet.
  * Stage 2 (PipelineRunner): reads the savepoint like any other source,
  * derives a label, and fits the standard preprocess → vectorize → LR
  * chain, reporting AUROC.
  *
  * Run: sbt "runMain graft.examples.CurateThenTrain /root/testdata/sf0.01"
  */
object CurateThenTrain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val root = "/tmp/graft-curate-train-demo"
    val spark = GraftSession.local(8, "graft-curate-then-train")

    // ---- stage 1: curation
    val curateConf = GraftConf.fromJson(
      s"""{
        |  "project": {"name": "curate", "root": "$root"},
        |  "data": {"source": "parquet://$dir/documents.parquet"},
        |  "columns": {"response": "lang"},
        |  "corpus": {"steps": [
        |    {"op": "dedup_exact"},
        |    {"op": "dedup_minhash", "threshold": 0.7},
        |    {"op": "span_dedup", "window": 8, "threshold": 0.5},
        |    {"op": "quality_gate", "minTokens": 10, "maxTokens": 5000},
        |    {"op": "temp_mix", "quota": 300, "alpha": 0.5, "groupColumn": "source"}
        |  ]}
        |}""".stripMargin)
    val curated = CorpusRunner.run(spark, curateConf, savepointing = true)
    val cleanedPath = curated.savepoints.path("corpus", 0, "clean")
    println(s"[curate-train] curated ${curated.corpus.count()} docs -> $cleanedPath")

    // ---- stage 2: train on the curation savepoint
    val trainConf = GraftConf.fromJson(
      s"""{
        |  "project": {"name": "train-on-curated", "root": "$root"},
        |  "data": {
        |    "source": "parquet://$cleanedPath",
        |    "queries": ["SELECT *, CASE WHEN lang = 'en' THEN 'pos' ELSE 'neg' END AS y FROM graftView0"]
        |  },
        |  "columns": {"response": "y", "text": ["text"], "numerical": ["n_chars"],
        |              "primaryKey": ["doc_id"]},
        |  "sampling": {"samplingType": "random", "split": [80, 20], "seed": 20},
        |  "preprocessing": [
        |    {"op": "case_normalization", "inputColumn": "text", "outputColumn": "t_lower"},
        |    {"op": "tokenizer", "inputColumn": "t_lower", "outputColumn": "tokens"}
        |  ],
        |  "vectorization": {"method": "tfidf", "slots": 4096}
        |}""".stripMargin)
    val result = PipelineRunner.run(spark, trainConf, savepointing = true)
    println(f"[curate-train] AUROC train=${result.metrics("auroc_train")}%.4f " +
      f"test=${result.metrics("auroc_test")}%.4f over the curated corpus")
    spark.stop()
  }
}
