package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-located join: pre-bucketing both fact tables on the join
  * key at write time removes the shuffle from every later join on that
  * key — at 100 TB this converts the dominant exchange of a fact⋈fact
  * join into a zero-movement zip of co-located buckets. */
class BucketingSpec extends SparkSpec {

  behavior of "bucketed tables"

  it should "join co-located buckets with no exchange" in {
    val a = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("va"))
    val b = spark.range(1000).select(col("id").as("k"), (col("id") * 3).as("vb"))
    a.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("graft_bkt_a")
    b.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("graft_bkt_b")
    try {
      // hint forces the sort-merge path (a broadcast would hide the point)
      val j = spark.table("graft_bkt_a")
        .join(spark.table("graft_bkt_b").hint("merge"), "k")
      val p = j.queryExecution.executedPlan.toString
      p should include ("SortMergeJoin")
      p should not include "Exchange" // co-located: no shuffle either side
      j.count() shouldBe 1000
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }
}
