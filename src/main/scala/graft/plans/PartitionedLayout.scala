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

  /** Small-file compaction: rewrites `inPath` to `outPath` in
    * ~`targetMB`-sized files. Streaming sinks and over-parallel writes
    * leave thousands of KB-sized files per partition; at 100 TB the
    * scan's task-scheduling and footer-reading overhead then dominates
    * I/O. Sizing from the ACTUAL input bytes (not row counts) keeps the
    * result stable across schema/compression changes. Returns
    * (filesBefore, filesAfter). */
  def compactTo(spark: org.apache.spark.sql.SparkSession, inPath: String,
                outPath: String, targetMB: Int = 512): (Int, Int) = {
    val df = spark.read.parquet(inPath)
    val conf = spark.sparkContext.hadoopConfiguration
    val before = df.inputFiles
    val bytes = before.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
    val parts = math.max(1, math.ceil(bytes.toDouble / (targetMB * 1024L * 1024L)).toInt)
    df.repartition(parts).write.mode("overwrite").parquet(outPath)
    (before.length, spark.read.parquet(outPath).inputFiles.length)
  }
}
