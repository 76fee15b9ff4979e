package graft.plans

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Bounded-memory frequency summaries — the sketch path that
  * [[graft.queries.EventOpsPack.heavyHitters]]' exact form documents.
  *
  * The exact heavy-hitter aggregation shuffles one row per distinct key.
  * When the key domain is open-ended (URLs, shingles, user agents over
  * 100 TB), even that is too much. A Misra-Gries summary caps state at
  * `k` counters PER PARTITION: every item either increments its counter,
  * claims a free slot, or decrements all `k` counters at once. The
  * classical guarantee: a partition summary undercounts any item by at
  * most `n_p / (k+1)`; summing candidate counts across partitions keeps
  * the total undercount ≤ n/(k+1), so every item with true frequency
  * > n/(k+1) is GUARANTEED to surface as a candidate. One exact
  * `groupBy` over candidate keys only (|candidates| ≤ k·partitions ≪
  * |domain|) then rescores them precisely.
  *
  * This is the (rare) justified `mapPartitions` case: genuinely
  * imperative bounded-state per partition that no built-in aggregate
  * expresses. For error-bounded COUNTS of arbitrary (not just heavy)
  * items, Spark's built-in `df.stat.countMinSketch` is the complement —
  * see FrequencySketchSpec's cross-check.
  */
object FrequencySketch {

  /** Misra-Gries candidate set over `column` (any atomic type; compared
    * on its string form). Returns `(value, est_count)` rows: every value
    * whose true count exceeds n/(k+1) is present; `est_count` ≤ true
    * count ≤ est_count + n/(k+1). */
  def misraGriesCandidates(df: DataFrame, column: String, k: Int): DataFrame = {
    require(k > 0, "sketch capacity must be positive")
    val strings: Dataset[String] = {
      import df.sparkSession.implicits._
      df.select(col(column).cast("string")).as[String]
    }
    import df.sparkSession.implicits._
    strings.mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { v =>
        if (counters.contains(v)) counters(v) += 1L
        else if (counters.size < k) counters(v) = 1L
        else {
          // decrement-all: every tracked item pays one; zeros vacate slots
          val dead = List.newBuilder[String]
          counters.mapValuesInPlace((_, c) => c - 1L)
          counters.foreach { case (key, c) => if (c <= 0L) dead += key }
          dead.result().foreach(counters.remove)
        }
      }
      counters.iterator.map { case (v, c) => (v, c) }
    }.toDF("value", "est_count")
      .groupBy("value").agg(sum("est_count").as("est_count"))
  }

  /** Exact heavy hitters via the sketch: Misra-Gries candidate
    * generation (bounded memory) followed by ONE exact count restricted
    * to the candidate set with a broadcast semi-join — the end-to-end
    * scale recipe. `minCount` keys are guaranteed complete when
    * `minCount > n/(k+1)`. */
  def heavyHitters(df: DataFrame, column: String, k: Int,
                   minCount: Long): DataFrame = {
    val candidates = misraGriesCandidates(df, column, k).select("value")
    df.select(col(column).cast("string").as("value"))
      .join(broadcast(candidates), Seq("value"), "left_semi")
      .groupBy("value").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }
}
