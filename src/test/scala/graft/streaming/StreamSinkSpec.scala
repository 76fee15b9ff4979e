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

  behavior of "StreamSink.compact + retire"

  private def commitBatches(root: String, ids: Seq[Long]): Unit =
    ids.foreach(id => StreamSink.idempotent(root)(
      Seq(Event(id, ts(id), id, s"view$id", id.toDouble)).toDF(), id))

  private def parquetFiles(dir: java.io.File): Seq[java.io.File] = {
    val here = Option(dir.listFiles()).getOrElse(Array.empty)
    here.filter(_.isDirectory).flatMap(parquetFiles).toSeq ++
      here.filter(_.getName.endsWith(".parquet")).toSeq
  }

  it should "fold batches into segments with equal content and a bounded file count" in {
    val root = java.nio.file.Files
      .createTempDirectory("graft-stream-sink-compact").toString
    commitBatches(root, 0L to 5L)
    val before = StreamSink.readCommitted(spark, root)
      .orderBy("user_id").collect().toSeq

    // COMPACTION EQUALITY: compacted segment + batch tail == pre-compaction
    StreamSink.compact(spark, root, upToBatch = 3L) shouldBe 3L
    StreamSink.compactionWatermark(root) shouldBe Some(3L)
    StreamSink.readCommitted(spark, root)
      .orderBy("user_id").collect().toSeq shouldBe before

    // FILE-COUNT BOUND: 4 folded batches -> 1 segment file (targetFiles=1)
    val cRoot = s"$root/_compacted"
    val segDir = new java.io.File(cRoot,
      graft.plans.SnapshotStore.dataDirOf(cRoot, 3L))
    parquetFiles(segDir).length shouldBe 1

    // INCREMENTAL: the next compaction folds only the (3, 5] tail; the
    // first segment's bytes never move
    val segBytes = parquetFiles(segDir).map(f => f.getName -> f.length())
    StreamSink.compact(spark, root, upToBatch = 5L) shouldBe 5L
    parquetFiles(segDir).map(f => f.getName -> f.length()) shouldBe segBytes
    StreamSink.readCommitted(spark, root)
      .orderBy("user_id").collect().toSeq shouldBe before

    // idempotent re-compaction at the same watermark: no-op, no error
    StreamSink.compact(spark, root, upToBatch = 5L) shouldBe 5L
    StreamSink.readCommitted(spark, root).count() shouldBe 6
  }

  it should "retire folded batches under the grace window without breaking live readers" in {
    val root = java.nio.file.Files
      .createTempDirectory("graft-stream-sink-retire").toString
    commitBatches(root, 0L to 4L)
    // a LIVE reader resolves its data paths before compaction+retention
    val live = StreamSink.readCommitted(spark, root)
    StreamSink.compact(spark, root, upToBatch = 2L)

    // grace window: a default-grace retire reclaims NOTHING young — the
    // folded batches' files stay on disk for readers mid-scan, only the
    // batch-grain manifests disappear for new readers
    StreamSink.retire(root) shouldBe Seq.empty
    StreamSink.committedBatches(root) shouldBe Seq(3L, 4L)
    live.orderBy("user_id").collect().map(_.getLong(0)).toSeq shouldBe
      Seq(0L, 1L, 2L, 3L, 4L)

    // new readers see the same rows through segment + tail
    StreamSink.readCommitted(spark, root)
      .orderBy("user_id").collect().map(_.getLong(0)).toSeq shouldBe
      Seq(0L, 1L, 2L, 3L, 4L)

    // force-retire (grace 0): the three folded data dirs are reclaimed
    val swept = StreamSink.retire(root, graceMs = 0L)
    swept.count(_.startsWith("v=")) shouldBe 3
    StreamSink.readCommitted(spark, root)
      .orderBy("user_id").collect().map(_.getLong(0)).toSeq shouldBe
      Seq(0L, 1L, 2L, 3L, 4L)
    // batch grain is gone below the watermark, intact above it
    StreamSink.committedBatches(root) shouldBe Seq(3L, 4L)
  }
}
