package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // trades(key, t) pick up the latest quote with qt <= t
  private val trades = Seq(
    ("A", 10L, 100L), ("A", 20L, 101L), ("A", 5L, 102L),
    ("B", 15L, 103L), ("C", 50L, 104L)).toDF("sym", "t", "trade_id")
  private val quotes = Seq(
    ("A", 8L, 1.0), ("A", 10L, 2.0), ("A", 19L, 3.0),
    ("B", 20L, 4.0)).toDF("sym", "qt", "px")

  behavior of "AsOfJoin"

  it should "match each left row to the latest right row at or before it" in {
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "t", "qt")
      .select("trade_id", "asof_px").as[(Long, Option[Double])]
      .collect().toMap
    out shouldBe Map(
      100L -> Some(2.0), // t=10 matches qt=10 (<=, equal wins)
      101L -> Some(3.0), // t=20 matches qt=19
      102L -> None,      // t=5 precedes all A quotes
      103L -> None,      // B quote is at 20 > 15
      104L -> None)      // C has no quotes
  }

  it should "keep every left row and column (left-outer shape)" in {
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "t", "qt")
    out.count() shouldBe trades.count()
    out.columns.toSeq shouldBe Seq("sym", "t", "trade_id", "asof_px")
  }

  it should "shuffle once per side on the key — no range/cross join" in {
    val p = AsOfJoin.asOf(trades, quotes, Seq("sym"), "t", "qt")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should not include "SinglePartition"
  }
}
