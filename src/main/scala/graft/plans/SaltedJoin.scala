package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Static skew mitigation for shuffles AQE cannot re-plan.
  *
  * AQE's skew-join splitting handles sort-merge join partitions at
  * runtime, but two skew shapes remain: (1) a shuffled hash/broadcast-less
  * join keyed on a handful of hot values where one side must replicate,
  * and (2) exact `countDistinct` on a skewed group key, whose single
  * per-key reduce state AQE cannot split. Classic salting fixes both by
  * widening the hot key with a salt the planner shuffles on.
  */
object SaltedJoin {

  /** Equi-join `big ⋈ small` on `keys`, salted `factor` ways: the big side
    * gets a deterministic per-row salt, the small side is replicated once
    * per salt value, and the join key becomes (keys, salt) — a hot key's
    * rows spread over `factor` reducers instead of one. Replication cost:
    * |small| × factor rows shuffled. Result is row-identical to the
    * unsalted join. */
  def join(big: DataFrame, small: DataFrame, keys: Seq[String],
           factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val saltedBig = big.withColumn("__salt",
      pmod(hash(col(keys.head) :: monotonically_increasing_id() :: Nil: _*),
        lit(factor)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedBig.join(saltedSmall, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Exact distinct count per group with the skew-safe two-phase shape:
    * dedupe on (key, value) first — the shuffle spreads by value, so a hot
    * key fans out — then count per key. Equivalent to
    * `groupBy(keys).agg(countDistinct(valueCol))` row-for-row. */
  def countDistinctSkewSafe(df: DataFrame, keys: Seq[String],
                            valueCol: String, outCol: String): DataFrame = {
    val keyCols: Seq[Column] = keys.map(col)
    df.select(keyCols :+ col(valueCol): _*)
      .distinct() // shuffle keyed on (keys, value) — no hot-key reducer
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as(outCol))
  }
}
