package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scalable exact global ordering ops.
  *
  * `Window.orderBy(...)` with no partition key collapses the whole dataset
  * into ONE task (Spark warns "No Partition Defined for Window operation") —
  * a non-starter at 100 TB. This utility computes exact global row numbers
  * with the classic two-pass range-sort scheme instead:
  *
  *   1. `repartitionByRange` on the sort keys (the same parallel range
  *      partitioner a distributed ORDER BY uses) + in-partition sort, then
  *      `monotonically_increasing_id()` — which is (partitionId << 33 |
  *      rowInPartition) — captured in the SAME narrow stage, so no second
  *      shuffle can reorder or eliminate the range exchange;
  *   2. one tiny job counts rows per partition → cumulative offsets
  *      (numPartitions longs on the driver);
  *   3. global row number = offset(partition) + rowInPartition + 1, a
  *      row-local expression.
  *
  * Every stage is partition-parallel; driver state is O(partitions). The
  * sorted frame is persisted (memory-and-disk) so both passes see one
  * materialization — also what you'd do on a cluster to avoid re-sorting.
  */
object GlobalRank {

  private val RowMask = (1L << 33) - 1

  /** Adds `outCol` = exact 1-based global row number under `sortCols`.
    * The returned frame is persisted; `unpersist()` it when consumed. */
  def withRowNumber(df: DataFrame, sortCols: Seq[Column], outCol: String): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pid = shiftright(col("__mid"), 33).cast("int")
    val counts = sorted.groupBy(pid.as("__pid")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until parts).scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
    val offsetExpr = element_at(
      typedlit(offsets.take(parts).zipWithIndex.map { case (o, p) => p -> o }.toMap),
      pid)
    sorted
      .withColumn(outCol, offsetExpr + col("__mid").bitwiseAND(RowMask) + 1)
      .drop("__mid")
  }

  /** Adds, for each `(inCol, outCol)` in `sums`, the inclusive running sum
    * of `inCol` under the global `sortCols` order — the scalable twin of
    * `sum(inCol).over(Window.orderBy(sortCols).rowsBetween(unboundedPreceding,
    * currentRow))`, which would collapse to one task.
    *
    * Same two-pass scheme as [[withRowNumber]]: range-partition + local
    * sort, then one tiny job computes per-partition totals whose prefix
    * sums become per-partition offsets (O(partitions) driver state); the
    * within-partition running sum is an ordinary keyed window over the
    * partition id — every stage partition-parallel. */
  def withRunningSums(df: DataFrame, sortCols: Seq[Column],
                      sums: Seq[(String, String)]): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33).cast("int"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one tiny job: per-partition totals of every summed column
    val totalAggs = sums.map { case (in, _) => sum(col(in)).as(in) }
    val totals = sorted.groupBy(col("__pid")).agg(totalAggs.head, totalAggs.tail: _*)
      .collect().map(r => r.getInt(0) -> r).toMap
    // offset(p) = Σ totals over partitions < p, emitted as one O(1)-depth
    // map literal + element_at lookup (same form as withRowNumber) — a
    // when-chain here would grow the expression tree with the partition
    // count, a codegen/analysis liability at thousands of partitions
    def offsetExpr(in: String): Column = {
      val perPart = (0 until parts).map { p =>
        totals.get(p).map(_.getAs[Any](in)).getOrElse(null)
      }
      val offsets = perPart.scanLeft(0.0) { (acc, t) =>
        acc + (t match {
          case null => 0.0
          case n: Number => n.doubleValue()
        })
      }
      element_at(
        typedlit(offsets.take(parts).zipWithIndex.map { case (o, p) => p -> o }.toMap),
        col("__pid"))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy("__mid")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val withSums = sums.foldLeft(sorted) { case (acc, (in, out)) =>
      acc.withColumn(out, offsetExpr(in) + sum(col(in)).over(w))
    }
    withSums.drop("__mid", "__pid")
  }

  /** Adds `outCol` = SQL-standard NTILE(k) bucket (1-based) under
    * `sortCols`, computed from the exact global row number — the scalable
    * twin of `ntile(k).over(Window.orderBy(...))`. */
  def withNtile(df: DataFrame, sortCols: Seq[Column], k: Int, outCol: String): DataFrame = {
    val rn = "__rn"
    val ranked = withRowNumber(df, sortCols, rn)
    val n = ranked.count()
    // SQL NTILE: first (n % k) buckets hold ceil(n/k) rows, the rest floor.
    val size = n / k
    val rem = n % k
    val cut = rem * (size + 1) // rows in the oversized buckets
    val r0 = col(rn) - 1 // 0-based
    val bucket =
      if (size == 0) r0 + 1 // fewer rows than buckets: row i → bucket i+1
      else when(r0 < cut, floor(r0 / (size + 1)) + 1)
        .otherwise(lit(rem) + floor((r0 - cut) / size) + 1)
    ranked.withColumn(outCol, bucket.cast("long")).drop(rn)
  }

  /** Exact interpolated per-group percentiles (PERCENTILE_CONT /
    * `percentile()` semantics) WITHOUT the per-group value buffer the
    * exact aggregate carries: `percentile(v, p)` over a low-cardinality
    * group key buffers EVERY group value in one aggregation buffer — at
    * 100 TB, billions of values per group → executor OOM. Here the exact
    * values come from the two-pass range-sort rank instead: global row
    * number over (group, value), per-group 0-based rank via an
    * O(groups) broadcast of min-rank offsets, the two rows flanking
    * index p·(n−1) filtered out, and the standard interpolation
    * v_lo + (h−⌊h⌋)·(v_hi−v_lo) as an |groups|-row final select. Every
    * stage is partition-parallel; no unbounded aggregation state.
    *
    * NULL values are ignored, exactly as `percentile()` ignores them —
    * ranking them would inflate n and shift (or null out) the flanks.
    *
    * Returns one row per group: (groupCol, n, [avg,] p0, p1, … — one
    * double column per requested percentile, in `ps` order; `avg` only
    * when `withAvg`, computed in the SAME stats pass so callers don't
    * re-scan the input for it). Values are NOT rounded — callers round
    * for their oracle contract. The output is EAGERLY materialized as a
    * local checkpoint (it is O(groups) rows by this helper's very
    * premise) so the range-sorted intermediate can be unpersisted here
    * instead of leaking into the caller's session. */
  def groupPercentilesExact(df: DataFrame, groupCol: String,
                            valueCol: String, ps: Seq[Double],
                            withAvg: Boolean = false): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      s"percentiles must be in [0,1], got ${ps.mkString(",")}")
    val ranked = withRowNumber(
      df.select(col(groupCol), col(valueCol))
        .filter(col(valueCol).isNotNull),
      Seq(col(groupCol), col(valueCol)), "__rn")
    val statAggs = Seq(min("__rn").as("__rn0"), count(lit(1)).as("__n")) ++
      (if (withAvg) Seq(avg(valueCol).as("__avg")) else Nil)
    val stats = ranked.groupBy(groupCol).agg(statAggs.head, statAggs.tail: _*)
    val j = ranked.join(broadcast(stats), groupCol)
      .withColumn("__r0", (col("__rn") - col("__rn0")).cast("double"))
    def idx(p: Double) = lit(p) * (col("__n") - 1).cast("double")
    def flank(p: Double, hi: Boolean) =
      col("__r0") === (if (hi) ceil(idx(p)) else floor(idx(p)))
    val keep = ps.map(p => flank(p, hi = false) || flank(p, hi = true))
      .reduceLeft(_ || _)
    val aggs = (max("__n").as("n") +:
      (if (withAvg) Seq(max("__avg").as("avg")) else Nil)) ++
      ps.zipWithIndex.flatMap { case (p, i) =>
        Seq(min(when(flank(p, hi = false), col(valueCol))).cast("double").as(s"__l$i"),
          min(when(flank(p, hi = true), col(valueCol))).cast("double").as(s"__h$i"))
      }
    val agged = j.filter(keep).groupBy(groupCol).agg(aggs.head, aggs.tail: _*)
    val outs = ps.zipWithIndex.map { case (p, i) =>
      val h = lit(p) * (col("n") - 1).cast("double")
      (col(s"__l$i") + (h - floor(h)) * (col(s"__h$i") - col(s"__l$i")))
        .as(s"p$i")
    }
    val keepCols = Seq(col(groupCol), col("n")) ++
      (if (withAvg) Seq(col("avg")) else Nil) ++ outs
    val out = agged.select(keepCols: _*).localCheckpoint(true)
    ranked.unpersist()
    out
  }
}
