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
}
