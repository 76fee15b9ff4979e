package graft.plans

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed storage layout: pre-shuffled tables for exchange-free joins
  * and aggregations.
  *
  * A join between two fact-scale tables normally shuffles BOTH sides on
  * the join key every time the join runs. At 100 TB that shuffle — not
  * the join itself — is the dominant cost, and it is paid per query.
  * Bucketing moves that shuffle to WRITE time, once: each table is
  * hash-partitioned into `n` buckets on the join key as it is written
  * (`DataFrameWriter.bucketBy`), and Catalyst's `EnsureRequirements`
  * then recognizes that both scans already satisfy the join's
  * `HashClusteredDistribution` and plans a SortMergeJoin with NO
  * Exchange on either side. With `sortBy` on the same key the per-
  * partition sort disappears too — the join degenerates to a streaming
  * merge of pre-sorted bucket files.
  *
  * The same applies to repeated `groupBy(key)` aggregations over a
  * bucketed table: partial aggregation is still map-side, and the final
  * aggregation reuses the bucket clustering instead of shuffling.
  *
  * Scale rules encoded here:
  *  - bucket counts on the two sides of a join must be EQUAL (Spark can
  *    coalesce mismatched counts only when one divides the other and
  *    `spark.sql.bucketing.coalesceBucketsInJoin.enabled` is on) — pick
  *    one corpus-wide bucket count per key domain and stick to it;
  *  - one file per bucket per write task is the failure mode of naive
  *    bucketed writes (`numWriteTasks x numBuckets` files). Repartition
  *    on the bucket key first so each task owns whole buckets and the
  *    layout lands as exactly `numBuckets` files.
  *
  * Reference scope note: the reference engine has no storage-layout
  * operator; this is part of the beyond-the-reference 100 TB surface
  * (SURVEY §8 "Beyond the reference").
  */
object BucketedLayout {

  /** Writes `df` as a bucketed managed table clustered (and sorted) on
    * `keys` into `numBuckets` buckets. The pre-`repartition` keeps the
    * file count at `numBuckets` instead of `tasks x buckets`. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    numBuckets: Int,
                    mode: String = "overwrite"): Unit = {
    require(keys.nonEmpty, "bucketed layout needs at least one key column")
    df.repartition(numBuckets, keys.map(col): _*)
      .write.mode(mode)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Equi-join of two same-bucket-count tables on `keys`. The plan this
    * produces over bucketed inputs has no Exchange on either side —
    * assert it with [[assertNoShuffle]] in tests or plan audits. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
                    keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), keys, joinType)

  /** True when the compiled physical plan contains no shuffle exchange.
    * Disable AQE around the check (the adaptive wrapper re-plans lazily
    * and hides the final operators until execution). */
  def hasNoShuffle(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange")
}
