package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Exactly-once contract of [[StreamSink.idempotent]]: redelivered
  * micro-batches leave the committed bytes untouched, restarts append
  * only new batch ids, and readers see every committed row exactly once. */
class StreamSinkSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(minutes: Long) = new Timestamp(minutes * 60 * 1000)

  private def dataFileBytes(root: String, v: Long): Map[String, Long] = {
    val raw = graft.plans.SnapshotStore.dataDirOf(root, v)
    val abs = if (raw.contains(":") || raw.startsWith("/")) raw
      else s"$root/$raw" // manifest dirs are root-relative
    val dir = if (abs.startsWith("file:"))
      new java.io.File(new java.net.URI(abs)) else new java.io.File(abs)
    val files = dir.listFiles()
    require(files != null, s"no data dir at $raw")
    files.filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length()).toMap
  }

  behavior of "StreamSink.idempotent"

  it should "commit each micro-batch exactly once and survive redelivery byte-identically" in {
    val root = java.nio.file.Files
      .createTempDirectory("graft-stream-sink").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-stream-sink-ckpt").toString
    val in = MemoryStream[Event]
    val q = in.toDS().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch((df: org.apache.spark.sql.Dataset[Event], id: Long) =>
        StreamSink.idempotent(root)(df.toDF(), id))
      .start()
    try {
      in.addData(Event(1, ts(0), 1, "view", 1.0),
        Event(2, ts(1), 2, "view", 2.0))
      q.processAllAvailable()
      in.addData(Event(3, ts(2), 1, "purchase", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val batches = StreamSink.committedBatches(root)
    batches.length should be >= 2
    val before = batches.map(v => v -> dataFileBytes(root, v)).toMap
    StreamSink.readCommitted(spark, root).count() shouldBe 3

    // REDELIVERY: the same batchId arrives again after a failure — even
    // with adversarially different content, the committed version must
    // not move (commit-once), and the on-disk data files stay identical
    val impostor = Seq(Event(99, ts(9), 9, "evil", 9.9)).toDF()
    batches.foreach(v => StreamSink.idempotent(root)(impostor, v))
    StreamSink.committedBatches(root) shouldBe batches
    batches.foreach(v => dataFileBytes(root, v) shouldBe before(v))
    StreamSink.readCommitted(spark, root).count() shouldBe 3
    StreamSink.readCommitted(spark, root)
      .filter($"event_type" === "evil").count() shouldBe 0L

    // CONTINUATION at later batch ids (a restarted job past the replayed
    // range): new ids commit, the old committed bytes never move
    val nextId = batches.max + 1
    StreamSink.idempotent(root)(
      Seq(Event(4, ts(3), 3, "view", 4.0)).toDF(), nextId)
    StreamSink.readCommitted(spark, root).count() shouldBe 4
    batches.foreach(v => dataFileBytes(root, v) shouldBe before(v))
  }

  it should "keep half-written batches invisible until the manifest commits" in {
    val root = java.nio.file.Files
      .createTempDirectory("graft-stream-sink-crash").toString
    StreamSink.idempotent(root)(
      Seq(Event(1, ts(0), 1, "view", 1.0)).toDF(), 0L)
    // model a crashed writer: orphan data files, no manifest
    val orphan = new java.io.File(s"$root/v7-orphan")
    orphan.mkdirs()
    java.nio.file.Files.writeString(
      orphan.toPath.resolve("part-00000.parquet"), "garbage")
    StreamSink.committedBatches(root) shouldBe Seq(0L)
    StreamSink.readCommitted(spark, root).count() shouldBe 1
    // the redelivery of batch 7 then publishes cleanly
    StreamSink.idempotent(root)(
      Seq(Event(2, ts(1), 2, "view", 2.0)).toDF(), 7L)
    StreamSink.committedBatches(root) shouldBe Seq(0L, 7L)
    StreamSink.readCommitted(spark, root).count() shouldBe 2
  }

  it should "let exactly one of two racing writers commit a batch id" in {
    val root = java.nio.file.Files
      .createTempDirectory("graft-stream-sink-race").toString
    // model the zombie-driver race: both writers passed the versions()
    // pre-check (nothing committed yet), then publish the same batchId.
    // The no-clobber manifest rename lets exactly one in; the direct
    // publish surfaces the loss loudly, and idempotent() swallows it
    // (deterministic replay ⇒ same data).
    graft.plans.SnapshotStore.publish(
      Seq(Event(1, ts(0), 1, "view", 1.0)).toDF(), root, 3L,
      overwrite = false)
    an[org.apache.hadoop.fs.FileAlreadyExistsException] should be thrownBy
      graft.plans.SnapshotStore.publish(
        Seq(Event(1, ts(0), 1, "view", 1.0)).toDF(), root, 3L,
        overwrite = false)
    noException should be thrownBy StreamSink.idempotent(root)(
      Seq(Event(1, ts(0), 1, "view", 1.0)).toDF(), 3L)
    StreamSink.committedBatches(root) shouldBe Seq(3L)
    StreamSink.readCommitted(spark, root).count() shouldBe 1
  }
}
