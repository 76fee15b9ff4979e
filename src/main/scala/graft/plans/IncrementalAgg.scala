package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregation state — rollups over an append-only fact
  * table WITHOUT rescanning history.
  *
  * A daily "distinct users + event counts per type" over a 100 TB log
  * must not recompute from the epoch each day. Every aggregate this
  * module materializes is ALGEBRAIC — count, sum, min, max, and an HLL
  * sketch (Spark's DataSketches `hll_sketch_agg`) for distinct — so
  * yesterday's state and today's partition fold with a plain union +
  * re-aggregate: counts/sums add, min/max take extrema, sketches union
  * register-wise. The daily cost is |today| + |state| rows, never
  * |history|. (AVG is derived at read time as sum/n; nothing
  * non-algebraic, like a median, belongs in incremental state — route
  * those through [[graft.queries.Relational.robustOutliers]]-style exact
  * passes or sketch families instead.)
  *
  * Two honest caveats, pinned by IncrementalAggSpec: float sums are
  * NOT associative, so incremental and full-batch `sum_v` can differ in
  * the last ulp (use DECIMAL when cents-exactness matters); and a
  * DataSketches HLL union is estimate-equivalent to a single-pass
  * sketch only within the sketch's error band, not register-identical —
  * unioning promotes sparse-mode sketches to dense HLL, while a small
  * single-pass sketch stays in its near-exact sparse mode.
  */
object IncrementalAgg {

  /** Aggregation state of `df` grouped by `keys`: algebraic summaries of
    * `valueCol` plus an HLL distinct sketch of `distinctCol`. */
  def state(df: DataFrame, keys: Seq[String], valueCol: String,
            distinctCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(valueCol).as("sum_v"),
        min(valueCol).as("min_v"),
        max(valueCol).as("max_v"),
        hll_sketch_agg(col(distinctCol), lit(lgK)).as("distinct_hll"))

  /** Folds any number of state tables (yesterday's state + today's new
    * partition's state) into one: pure re-aggregation of algebraic
    * parts. */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state table")
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum("n").as("n"),
        sum("sum_v").as("sum_v"),
        min("min_v").as("min_v"),
        max("max_v").as("max_v"),
        hll_union_agg(col("distinct_hll")).as("distinct_hll"))
  }

  /** Read-time finalization: derived aggregates + sketch estimates. */
  def finalizeState(state: DataFrame): DataFrame =
    state.select(
      state.columns.filterNot(c => c == "distinct_hll" || c == "sum_v")
        .map(col) ++ Seq(
        col("sum_v"),
        (col("sum_v") / col("n")).as("avg_v"),
        hll_sketch_estimate(col("distinct_hll")).as("n_distinct")): _*)
}
