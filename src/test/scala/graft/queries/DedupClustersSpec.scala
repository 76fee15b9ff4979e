package graft.queries

import graft.SparkSpec

/** The two connected-components paths (driver union-find under the edge
  * threshold; distributed min-label propagation with pointer jumping above
  * it) must produce identical cluster labelings. */
class DedupClustersSpec extends SparkSpec {

  behavior of "dedupClusters"

  it should "produce identical clusters from the driver and distributed paths" in {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val driver = LlmData.dedupClusters(spark, dir, maxDriverEdges = Long.MaxValue)
      .collect().map(_.toSeq).toSeq
    val distributed = LlmData.dedupClusters(spark, dir, maxDriverEdges = 0L)
      .collect().map(_.toSeq).toSeq
    distributed shouldBe driver
    driver should not be empty // the synthetic corpus plants near-dups
  }

  it should "label a long-chain component without overflowing the driver stack" in {
    // one path graph 0-1-2-…-N with edges UNIONED HIGH-TO-LOW: each union
    // just hangs the previous root under the new min (never walking more
    // than one link), so the first find() of the labeling phase walks the
    // full N-link chain — the case where a recursive find overflows the
    // driver stack. N is sized like a near-maxDriverEdges driver-path
    // input (the default threshold is 2^20 edges).
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val n = 300000
    val pairs = spark.range(n.toLong).coalesce(1)
      .select((lit(n) - $"id").as("da"), (lit(n) - $"id" - 1).as("db"))
    val labels = LlmData.componentLabels(spark, pairs.toDF(),
      maxDriverEdges = Long.MaxValue).collect()
    labels.length shouldBe n + 1
    all(labels.map(_.getLong(1))) shouldBe 0L // one component rooted at min id
  }
}
