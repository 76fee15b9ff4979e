package graft.examples

import graft.GraftSession
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._

/** End-to-end drive of the streaming ingest path — the continuous twin of
  * [[CorpusQuickStart]]: the same `documents`/`events` tables replayed as
  * Structured-Streaming sources (file-source parquet streams, one file per
  * micro-batch) through the production operators:
  *
  *  1. document stream → normalize (stateless) → watermark-bounded exact
  *     dedup (`dropDuplicatesWithinWatermark` — state sized by the
  *     lateness horizon, not corpus size) → cleaned parquet sink
  *  2. event stream → watermarked tumbling-window counts (closed windows
  *     evicted, append-mode emission)
  *
  * Everything runs with `availableNow` triggers, so the run drains the
  * backfill like a stream and terminates — the same code would keep
  * running against a live directory/Kafka source at 100 TB/day.
  *
  * Run: sbt "runMain graft.examples.StreamingQuickStart /root/testdata/sf0.01"
  */
object StreamingQuickStart {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = "/tmp/graft-streaming-demo"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    val spark = GraftSession.local(8, "graft-streaming-quickstart")

    // stage the tables into drop-directories — file-source streams watch a
    // DIRECTORY (new files become micro-batches), which is also how a real
    // ingest lands data
    def stage(table: String, copies: Int = 1): String = {
      val d = java.nio.file.Paths.get(out, s"in_$table")
      java.nio.file.Files.createDirectories(d)
      (1 to copies).foreach(i => java.nio.file.Files.copy(
        java.nio.file.Paths.get(dir, s"$table.parquet"),
        d.resolve(s"${table}_$i.parquet")))
      d.toString
    }
    // the documents file lands TWICE — a producer re-send. The watermark
    // dedup must drop the entire second delivery even though it arrives
    // with fresh ingest timestamps (the dropDuplicatesWithinWatermark
    // semantics ordinary dropDuplicates("hash", ts) would get wrong).
    val docsIn = stage("documents", copies = 2)
    val eventsIn = stage("events")

    // ---- 1. streaming corpus ingest: dedup with watermark-bounded state
    val batchDocs = graft.Tables.documents(spark, dir)
    val docSchema = batchDocs.schema
    val docStream = spark.readStream.schema(docSchema)
      .parquet(docsIn)
      // stateless normalize (CorpusRunner's `normalize` step, row-local)
      .withColumn("text", trim(regexp_replace(lower(col("text")), "\\s+", " ")))
      // synthetic arrival time: file-source rows carry no event time, so
      // stamp ingest time (a live pipeline would use the producer's ts)
      .withColumn("ingest_ts", current_timestamp())
    val deduped = StreamOps.dedupWithinWatermark(
      docStream, "text", "ingest_ts", "10 minutes")
    val q1 = deduped
      .writeStream.format("parquet")
      .option("path", s"$out/clean")
      .option("checkpointLocation", s"$out/clean.ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q1.awaitTermination(120000)
    val kept = spark.read.parquet(s"$out/clean").count()
    val inRows = batchDocs.count()
    // batch twin: exact dedup distinct-hash count (LlmData.dedupExact)
    val batchKept = graft.queries.LlmData.dedupExact(spark, dir).count()
    println(s"[streaming] docs in=${2 * inRows} (double delivery) " +
      s"deduped=$kept (batch distinct texts=$batchKept)")

    // ---- 1b. streaming NEAR-dup probe against the existing corpus:
    // row-local MinHash banding (no aggregation state) + stream-static
    // index join + row-local exact verify — the continuous twin of the
    // batch dedup_minhash_incr
    val index = StreamOps.nearDupIndex(
      batchDocs.filter(col("doc_id") < 400).select("doc_id", "text"),
      "doc_id", "text")
    val newStream = spark.readStream.schema(docSchema).parquet(docsIn)
      .filter(col("doc_id") >= 400).select("doc_id", "text")
    val probed = StreamOps.nearDupProbe(newStream, index, "doc_id", "text")
    val q1b = probed
      .writeStream.format("parquet")
      .option("path", s"$out/neardup")
      .option("checkpointLocation", s"$out/neardup.ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q1b.awaitTermination(120000)
    val flagged = spark.read.parquet(s"$out/neardup")
      .select("new_id").distinct().count()
    println(s"[streaming] new docs near-duplicating the existing corpus: $flagged")

    // ---- 2. streaming event analytics: watermarked window counts
    // read the RAW parquet schema (TIMESTAMP(NANOS) arrives as long nanos
    // under nanosAsLong) and normalize inside the stream, exactly like the
    // batch Tables.events loader
    val rawSchema = spark.read.parquet(eventsIn).schema
    val evStream0 = spark.readStream.schema(rawSchema)
      .parquet(eventsIn)
    val evStream = rawSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        evStream0.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => evStream0.withColumn("ts", col("ts").cast("timestamp"))
    }
    val counts = StreamOps.windowedEventCounts(evStream,
      watermark = "1 hour", windowLen = "6 hours")
    val q2 = counts
      .writeStream.format("parquet")
      .option("path", s"$out/windows")
      .option("checkpointLocation", s"$out/windows.ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(120000)
    val win = spark.read.parquet(s"$out/windows")
    println(s"[streaming] closed event windows emitted: ${win.count()}")

    // ---- 3. exactly-once sink: the same window counts through the
    // idempotent manifest-committed writer — a redelivered micro-batch
    // (simulated below with adversarial content at a committed id) can
    // never change the committed bytes
    val q3 = StreamOps.windowedEventCounts(evStream,
        watermark = "1 hour", windowLen = "6 hours")
      .writeStream
      .option("checkpointLocation", s"$out/once.ckpt")
      .foreachBatch((df: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], id: Long) =>
        graft.streaming.StreamSink.idempotent(s"$out/once")(df.toDF(), id))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q3.awaitTermination(120000)
    val committed = graft.streaming.StreamSink.committedBatches(s"$out/once")
    val n0 = graft.streaming.StreamSink
      .readCommitted(spark, s"$out/once").count()
    import spark.implicits._
    committed.foreach(id => graft.streaming.StreamSink.idempotent(
      s"$out/once")(Seq(("evil", 1L)).toDF("event_type", "n_events"), id))
    val n1 = graft.streaming.StreamSink
      .readCommitted(spark, s"$out/once").count()
    println(s"[streaming] exactly-once sink: ${committed.size} batches, " +
      s"$n0 rows committed, $n1 after adversarial redelivery " +
      s"(${if (n0 == n1) "unchanged" else "CHANGED — BUG"})")

    spark.stop()
  }
}
