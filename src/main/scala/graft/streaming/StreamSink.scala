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
    * scan over the manifest-committed data directories (order-free —
    * batch provenance is recoverable per-version via
    * [[graft.plans.SnapshotStore.read]]). All batches share the sink's
    * schema, so a single scan beats a per-version read folded with
    * unionByName: that plan grows one node per micro-batch — thousands
    * deep after a day of streaming, with per-version footer reads and a
    * driver StackOverflow risk — while the multi-path scan stays O(1)
    * plan nodes with predicate pushdown intact. */
  def readCommitted(spark: SparkSession, root: String): DataFrame = {
    val vs = graft.plans.SnapshotStore.versions(root)
    require(vs.nonEmpty, s"StreamSink: nothing committed under $root")
    // dataDirOf returns root-relative names by contract; resolve against
    // root exactly like SnapshotStore.read does
    val dirs = vs.map { v =>
      new org.apache.hadoop.fs.Path(root,
        graft.plans.SnapshotStore.dataDirOf(root, v)).toString
    }
    spark.read.parquet(dirs: _*)
  }

  /** Committed batch ids, ascending. */
  def committedBatches(root: String): Seq[Long] =
    graft.plans.SnapshotStore.versions(root)
}
