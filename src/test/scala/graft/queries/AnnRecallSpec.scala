package graft.queries

import graft.SparkSpec

/** Approximation QUALITY of the ANN scale paths: recall of the LSH- and
  * IVF-bucketed candidate generation against the brute-force exact top-k.
  * Correctness of each path is already oracle-checked per query; this spec
  * asserts the thing the oracle can't — that the approximate paths return
  * mostly the same neighbors the exact scan would, so a user trading
  * all-pairs cost for bucketed candidate generation knows what they keep. */
class AnnRecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def resultSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  behavior of "ANN scale paths"

  it should "keep high recall of the exact top-k in the LSH path" in {
    // exact top-3 per query (brute force ranks top-5; take rnk <= 3)
    val exact = resultSet(
      LlmData.annTopK(spark, dir).filter(org.apache.spark.sql.functions.col("rnk") <= 3))
    val lsh = resultSet(LlmData.annLsh(spark, dir))
    val recall = (exact intersect lsh).size.toDouble / exact.size
    info(f"LSH recall@3 = $recall%.3f (${(exact intersect lsh).size}/${exact.size})")
    // 4 sign-projection planes = 16 buckets; same-bucket survivors must
    // still cover most exact neighbors on the synthetic corpus
    recall should be >= 0.5
  }

  it should "keep high recall of the exact top-k in the IVF path" in {
    val exact = resultSet(
      LlmData.annTopK(spark, dir).filter(org.apache.spark.sql.functions.col("rnk") <= 3))
    val ivf = resultSet(LlmData.annIvf(spark, dir))
    val recall = (exact intersect ivf).size.toDouble / exact.size
    info(f"IVF recall@3 (nprobe=3) = $recall%.3f (${(exact intersect ivf).size}/${exact.size})")
    recall should be >= 0.5
  }
}
