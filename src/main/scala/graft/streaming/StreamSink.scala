package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** EXACTLY-ONCE streaming sink on top of at-least-once delivery — the
  * missing half of the ingest story: the stateful operators in
  * [[StreamOps]] are replay-safe, but a plain parquet `foreachBatch`
  * writer re-appends redelivered micro-batches, silently double-counting
  * after any failure/restart.
  *
  * The mechanism is the versioned-manifest commit the engine already
  * trusts for index and tokenizer artifacts
  * ([[graft.plans.SnapshotStore]]): each micro-batch publishes as
  * version = batchId — data files first into a fresh nonce directory,
  * then one atomic manifest rename. Idempotence falls out of the
  * version check: Structured Streaming guarantees a redelivered batchId
  * carries the same data (deterministic replay from the checkpointed
  * offsets), so a batchId whose manifest is already committed is simply
  * skipped — the committed bytes never change, and a reader can never
  * observe a half-written batch (it resolves data dirs only through
  * committed manifests). A batch that CRASHED mid-publish left data
  * files but no manifest: invisible, and the redelivery publishes a
  * fresh nonce directory then commits.
  *
  * Scale: the manifest is O(1) metadata per micro-batch; the data write
  * keeps all of Spark's parallelism. Readers union committed batches
  * ([[readCommitted]]) — parquet-partitioned, predicate pushdown intact.
  */
object StreamSink {

  /** A `foreachBatch` function writing each micro-batch exactly-once
    * under `root`. Use: `.writeStream.foreachBatch(StreamSink.idempotent(root) _)`.
    *
    * Concurrency: the version pre-check is an optimization, not the
    * guard — the commit itself is a no-clobber manifest rename
    * (`publish(overwrite = false)`), so when a zombie driver and a
    * restarted query race on the same batchId exactly ONE manifest
    * lands; the loser's rename throws `FileAlreadyExistsException`,
    * which is swallowed here because a redelivered batchId replays the
    * same data by the streaming contract (deterministic replay from
    * checkpointed offsets) — its orphan data directory is reclaimed by
    * [[graft.plans.SnapshotStore.vacuum]]. */
  def idempotent(root: String)(df: DataFrame, batchId: Long): Unit = {
    val committed =
      graft.plans.SnapshotStore.versions(root).contains(batchId)
    if (!committed)
      try graft.plans.SnapshotStore.publish(df, root, batchId,
        overwrite = false)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => // lost
          // a benign race: the concurrent writer committed the same
          // deterministic batch
      }
  }

  /** Everything the sink has committed so far: ONE multi-path parquet
    * scan over compacted segments plus the uncompacted batch tail
    * (order-free — batch provenance is recoverable per-version via
    * [[graft.plans.SnapshotStore.read]] until [[retire]]). All batches
    * share the sink's schema, so a single scan beats a per-version read
    * folded with unionByName: that plan grows one node per micro-batch —
    * thousands deep after a day of streaming, with per-version footer
    * reads and a driver StackOverflow risk — while the multi-path scan
    * stays O(1) plan nodes with predicate pushdown intact. */
  def readCommitted(spark: SparkSession, root: String): DataFrame = {
    val dirs = resolveDirs(root)._2
    require(dirs.nonEmpty, s"StreamSink: nothing committed under $root")
    spark.read.parquet(dirs: _*)
  }

  /** Committed batch ids still visible at the batch grain, ascending —
    * batches folded by [[compact]] and dropped by [[retire]] no longer
    * appear (their rows live in compacted segments). */
  def committedBatches(root: String): Seq[Long] =
    graft.plans.SnapshotStore.versions(root)

  private def compactedRoot(root: String): String =
    new org.apache.hadoop.fs.Path(root, "_compacted").toString

  /** Highest batchId folded into a compacted segment, if any. */
  def compactionWatermark(root: String): Option[Long] =
    graft.plans.SnapshotStore.latestVersion(compactedRoot(root))

  /** (watermark, data dirs a committed-data reader must scan): every
    * compacted segment plus the batch dirs above the watermark. Batches
    * at or below the watermark are EXCLUDED even before [[retire]] drops
    * them — their rows are already inside a segment. */
  private def resolveDirs(root: String): (Option[Long], Seq[String]) = {
    import graft.plans.SnapshotStore
    import org.apache.hadoop.fs.Path
    val cRoot = compactedRoot(root)
    val w = SnapshotStore.latestVersion(cRoot)
    val segs = SnapshotStore.versions(cRoot).map(v =>
      new Path(cRoot, SnapshotStore.dataDirOf(cRoot, v)).toString)
    val tail = SnapshotStore.versions(root).filter(id => w.forall(id > _))
      .map(v => new Path(root, SnapshotStore.dataDirOf(root, v)).toString)
    (w, segs ++ tail)
  }

  /** Fold the uncompacted batch tail up to `upToBatch` into ONE new
    * compacted segment of at most `targetFiles` files — the answer to a
    * day of 1-minute micro-batches being 1,440 manifests and thousands
    * of small files. Each call folds ONLY the tail above the previous
    * watermark (segments are never re-read or rewritten), so total
    * compaction work over a sink's lifetime is O(data), not O(data ×
    * compactions); a segment is published with the SAME atomic manifest
    * commit batches use (`_compacted/` is its own [[graft.plans.SnapshotStore]]
    * root, version = watermark batchId), so a concurrent reader either
    * resolves the old batch dirs — which stay on disk until [[retire]]'s
    * grace window — or the new segment, never a half state. Racing
    * compactions at the same watermark collapse to one winner via the
    * no-clobber commit (deterministic content — same committed inputs).
    * Returns the new watermark, or the existing one when there is
    * nothing new to fold. */
  def compact(spark: SparkSession, root: String, upToBatch: Long,
              targetFiles: Int = 1): Long = {
    import graft.plans.SnapshotStore
    import org.apache.hadoop.fs.Path
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    val prevW = compactionWatermark(root)
    val fold = SnapshotStore.versions(root)
      .filter(id => id <= upToBatch && prevW.forall(id > _))
    if (fold.isEmpty) return prevW.getOrElse(
      throw new IllegalStateException(
        s"StreamSink.compact: nothing committed at or below $upToBatch"))
    val dirs = fold.map(v =>
      new Path(root, SnapshotStore.dataDirOf(root, v)).toString)
    val folded = spark.read.parquet(dirs: _*).coalesce(targetFiles)
    try SnapshotStore.publish(folded, compactedRoot(root), fold.max,
      overwrite = false)
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => // lost a
      // benign race: the concurrent compaction folded the same batches
    }
    fold.max
  }

  /** Retention: drop the batch-grain manifests already folded into
    * compacted segments, then reclaim their data directories (and any
    * superseded-segment orphans) via [[graft.plans.SnapshotStore.vacuum]].
    * The manifest delete only hides the batch from NEW readers — a live
    * reader that resolved its paths earlier keeps scanning files that
    * stay on disk until they out-age `graceMs` (default 1h), so the
    * window must exceed the longest-running reader. Returns the
    * reclaimed names. */
  def retire(root: String, graceMs: Long = 3600000L): Seq[String] = {
    import graft.plans.SnapshotStore
    val w = compactionWatermark(root).getOrElse(return Seq.empty)
    val folded = SnapshotStore.versions(root).filter(_ <= w)
    folded.foreach(v => SnapshotStore.dropManifest(root, v))
    SnapshotStore.vacuum(root, graceMs) ++
      SnapshotStore.vacuum(compactedRoot(root), graceMs)
  }
}
