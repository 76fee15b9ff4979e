package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GroupTopKSpec extends SparkSpec {
  import spark.implicits._

  // skewed groups: group 0 holds half the rows
  private def skewed = (1 to 2000).map { i =>
    (if (i % 2 == 0) 0L else (i % 7).toLong, i.toLong, (i * 37 % 1000).toLong)
  }.toDF("g", "id", "score")

  behavior of "GroupTopK"

  it should "match the single-window top-k exactly, for any salt count" in {
    val reference = skewed
      .withColumn("rank", row_number().over(
        Window.partitionBy("g").orderBy(col("score").desc, col("id"))).cast("long"))
      .filter(col("rank") <= 5)
      .select("g", "id", "score", "rank")
      .collect().toSet
    for (salts <- Seq(1, 4, 32)) {
      val got = GroupTopK.topK(skewed, Seq(col("g")),
          Seq(col("score").desc, col("id")), k = 5, salts = salts)
        .select("g", "id", "score", "rank")
        .collect().toSet
      got shouldBe reference
    }
  }

  it should "return fewer than k rows for groups smaller than k" in {
    val tiny = Seq((1L, 1L, 9L), (1L, 2L, 8L), (2L, 3L, 7L))
      .toDF("g", "id", "score")
    val out = GroupTopK.topK(tiny, Seq(col("g")),
      Seq(col("score").desc, col("id")), k = 5)
    out.count() shouldBe 3
    out.filter(col("g") === 2).select("rank").as[Long].head() shouldBe 1L
  }

  it should "keep both window phases keyed (no single-partition sort)" in {
    val p = GroupTopK.topK(skewed, Seq(col("g")),
        Seq(col("score").desc, col("id")), k = 5)
      .queryExecution.executedPlan.toString
    p should not include "SinglePartition"
  }
}
