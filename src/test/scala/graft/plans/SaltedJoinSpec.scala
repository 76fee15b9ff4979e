package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  // 90% of big-side rows share one hot key — the shape that melts a reducer
  private def big = spark.range(2000)
    .select(when(col("id") % 10 === 0, col("id") % 7).otherwise(lit(42L)).as("k"),
      col("id").as("payload"))
  private def small = (0L until 50L).map(k => (k, s"dim_$k")).toDF("k", "attr")

  behavior of "SaltedJoin"

  it should "produce exactly the unsalted join result" in {
    val salted = SaltedJoin.join(big, small, Seq("k"), factor = 8)
      .select("k", "payload", "attr").as[(Long, Long, String)].collect().sorted
    val plain = big.join(small, "k")
      .select("k", "payload", "attr").as[(Long, Long, String)].collect().sorted
    salted shouldBe plain
    plain.length shouldBe 2000 // every big row has a dim match
  }

  it should "spread a hot key over `factor` shuffle keys" in {
    val salted = big.withColumn("__salt",
      pmod(hash(col("k"), monotonically_increasing_id()), lit(8)))
    val spread = salted.filter(col("k") === 42)
      .select("__salt").distinct().count()
    spread should be > 4L // hot key occupies most of the 8 salt slots
  }

  it should "count distincts per group without a hot-key reducer" in {
    val df = big.withColumn("v", col("payload") % 100)
    val safe = SaltedJoin.countDistinctSkewSafe(df, Seq("k"), "v", "n_v")
      .as[(Long, Long)].collect().toMap
    val plain = df.groupBy("k").agg(countDistinct("v").as("n_v"))
      .as[(Long, Long)].collect().toMap
    safe shouldBe plain
  }
}
