package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic invariants of the customer/event analytics operators that the
  * DuckDB oracle can't express as neatly: probability normalization,
  * histogram mass conservation, quartile balance. */
class AnalyticsOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  behavior of "approximate scale paths"

  it should "keep approxQuantile cut points within tolerance of exact percentiles" in {
    // Several operators document approxQuantile → Bucketizer as their
    // 100 TB alternative to the exact range-sort (rfm_tiers, ntile_bins,
    // equiarea binning). Turn that claim into a tested bound: at relative
    // error 0.001 the cut points must sit within 1% of the exact ones.
    val df = graft.Tables.orders(spark, dir).select(col("o_totalprice").as("v"))
    val cuts = df.stat.approxQuantile("v", Array(0.25, 0.5, 0.75), 0.001)
    val exact = df.select(expr("percentile(v, array(0.25, 0.5, 0.75))"))
      .head().getSeq[Double](0)
    cuts.zip(exact).foreach { case (a, e) =>
      math.abs(a - e) / math.abs(e) should be < 0.01
    }
  }

  behavior of "markovTransitions"

  it should "emit a row-stochastic matrix (outgoing probabilities sum to 1)" in {
    val bad = EventOpsPack.markovTransitions(spark, dir)
      .groupBy("cur").agg(sum("p").as("total"))
      .filter(abs(col("total") - 1.0) > 1e-4)
      .count()
    bad shouldBe 0
  }

  behavior of "sessionStats"

  it should "conserve session mass against sessionize" in {
    val nSessions = EventOpsPack.sessionStats(spark, dir)
      .agg(sum("n_sessions")).head.getLong(0)
    val direct = Relational.sessionize(spark, dir).count()
    nSessions shouldBe direct
  }

  behavior of "rfmTiers"

  it should "assign near-equal customer mass to each quartile of every axis" in {
    val df = EventOpsPackSpecHelper.rfmPerTier(spark, dir)
    val total = df.agg(sum("n_cust")).head.getLong(0)
    for (axis <- Seq("r_tier", "f_tier", "m_tier")) {
      val sizes = df.groupBy(axis).agg(sum("n_cust").as("n"))
        .collect().map(_.getLong(1))
      sizes.length shouldBe 4
      // SQL NTILE: bucket sizes differ by at most one row
      (sizes.max - sizes.min) should be <= 1L
      sizes.sum shouldBe total
    }
  }
}

private object EventOpsPackSpecHelper {
  def rfmPerTier(s: org.apache.spark.sql.SparkSession, dir: String) =
    Relational.rfmTiers(s, dir)
}
