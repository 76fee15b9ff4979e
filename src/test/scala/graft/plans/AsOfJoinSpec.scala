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

  it should "match a brute-force as-of on randomized fixtures" in {
    val rng = new scala.util.Random(20) // fixed seed — reference convention
    for (round <- 1 to 3) {
      val lt = (1 to 120).map(i =>
        (s"k${rng.nextInt(6)}", rng.nextInt(100).toLong, (round * 1000 + i).toLong))
        .toDF("sym", "t", "trade_id")
      val rt = (1 to 80).map(_ =>
        (s"k${rng.nextInt(6)}", rng.nextInt(100).toLong, rng.nextDouble()))
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (key, ts)
        .toDF("sym", "qt", "px")
      val got = AsOfJoin.asOf(lt, rt, Seq("sym"), "t", "qt")
        .select("trade_id", "asof_px").as[(Long, Option[Double])]
        .collect().toMap
      // brute force: max-qt quote <= t per trade
      val quotes = rt.as[(String, Long, Double)].collect()
      val expected = lt.as[(String, Long, Long)].collect().map {
        case (sym, t, id) =>
          val c = quotes.filter(q => q._1 == sym && q._2 <= t)
          id -> (if (c.isEmpty) None else Some(c.maxBy(_._2)._3))
      }.toMap
      got shouldBe expected
    }
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
