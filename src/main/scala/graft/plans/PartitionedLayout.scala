package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** Hive-style partitioned directory layout (`write.partitionBy`) — the
  * coarse-grained pruning companion to [[ZOrderLayout]] (file-level
  * skipping) and [[BucketedLayout]] (exchange elision).
  *
  * A filter on a partition column never reads the excluded directories
  * at all: pruning happens at PLANNING time from the file index, before
  * a single byte of parquet is opened. For a 100 TB corpus partitioned
  * by ingest date or source, `WHERE source = 'web'` turns a full-corpus
  * scan into a single-directory scan — this is the first layout decision
  * any large table should make, with Z-order/bucketing layered inside
  * each partition.
  *
  * Scale rule encoded here: a naive `df.write.partitionBy(c)` has every
  * write task emit one file per partition value it happens to hold —
  * `tasks x values` small files. Repartitioning on the partition columns
  * first routes each value to one task, landing one file per partition.
  * Keep partition-column cardinality low (days, sources, languages — not
  * user ids); high-cardinality layout belongs to bucketing instead.
  */
object PartitionedLayout {

  /** Writes `df` under `path` partitioned by `parts`, one file per
    * partition value. */
  def write(df: DataFrame, path: String, parts: Seq[String],
            mode: String = "overwrite"): Unit = {
    require(parts.nonEmpty, "partitioned layout needs partition columns")
    df.repartition(parts.map(col): _*)
      .write.mode(mode).partitionBy(parts: _*).parquet(path)
  }

  /** Number of partition directories the compiled plan of `df` will
    * actually read — the pruning evidence (compare against the table's
    * total partition count). */
  def partitionsRead(df: DataFrame): Long =
    df.queryExecution.executedPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s.selectedPartitions.partitionCount.toLong
    }.sum
}
