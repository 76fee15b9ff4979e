package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  behavior of "RangeJoin"

  it should "match the brute-force theta join exactly" in {
    val points = (0L until 200L).map(i => (i, i * 7 % 500)).toDF("pid", "p")
    val intervals = (0L until 40L).map(i => (i, i * 12, i * 12 + 25))
      .toDF("iid", "lo", "hi")
    val bucketed = RangeJoin.pointInInterval(
        points, intervals, "p", "lo", "hi", width = lit(16L))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val brute = points.join(intervals,
        col("p") >= col("lo") && col("p") < col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    bucketed shouldBe brute
    brute.size should be > 0 // the fixture actually overlaps
  }

  it should "meet each matching pair exactly once (no distinct needed)" in {
    // interval spans many buckets; the point still lands in only one
    val points = Seq((1L, 100L)).toDF("pid", "p")
    val intervals = Seq((1L, 0L, 1000L)).toDF("iid", "lo", "hi")
    RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", lit(8L))
      .count() shouldBe 1L
  }

  it should "plan an equi-join on the bucket, not a nested loop" in {
    val points = spark.range(100).select(col("id").as("p"))
    val intervals = spark.range(100)
      .select((col("id") * 10).as("lo"), (col("id") * 10 + 5).as("hi"))
    val p = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", lit(10L))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
  }
}
