package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact top-k rows per group, skew-safe.
  *
  * The textbook plan — `row_number() OVER (PARTITION BY group ORDER BY ...)
  * <= k` — sorts EVERY row of a group in one task. With balanced groups
  * that's fine; with a hot group (one domain holding 10% of a 100 TB
  * corpus) a single task sorts billions of rows. Same hazard class as the
  * skewed join fixed by [[SaltedJoin]].
  *
  * Two phases fix it the same way: phase 1 ranks within (group, salt) —
  * the salt spreads a hot group over `salts` tasks, so no task sorts more
  * than ~|group|/salts rows — and keeps k per salt; phase 2 ranks the
  * ≤ k·salts survivors per group, a bounded-size sort regardless of the
  * input distribution. Both windows are keyed (never SinglePartition), and
  * phase 2's input is k·salts rows per group, not |group|.
  *
  * `orderCols` must be a total order within each group (add a unique
  * tie-breaker column) — then the result is exactly the single-window
  * top-k, independent of `salts`.
  */
object GroupTopK {

  def topK(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column],
           k: Int, salts: Int = 16, rankCol: String = "rank"): DataFrame = {
    require(k > 0 && salts > 0, "k and salts must be positive")
    // any salt assignment yields the same result (phase 2 re-ranks the
    // survivors), so a cheap row-id hash is enough — same scheme as
    // SaltedJoin
    val salted = df.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val local = Window.partitionBy((groupCols :+ col("__salt")): _*)
      .orderBy(orderCols: _*)
    val global = Window.partitionBy(groupCols: _*).orderBy(orderCols: _*)
    salted
      .withColumn("__lr", row_number().over(local))
      .filter(col("__lr") <= k)
      .withColumn(rankCol, row_number().over(global).cast("long"))
      .filter(col(rankCol) <= k)
      .drop("__salt", "__lr")
  }
}
