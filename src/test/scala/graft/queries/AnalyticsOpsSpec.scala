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

  behavior of "funnelStepsOf"

  it should "run an arbitrary ordered stage list with strict event order" in {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)
    // u1 completes all 4 stages in order; u2 signs up AFTER activating
    // (strict order must not count its signup→activate leg); u3 stops
    // after browse; u4 has activate with NO prior signup (never counted)
    val events = Seq(
      (1L, t(0), "browse"), (1L, t(1), "signup"), (1L, t(2), "activate"),
      (1L, t(3), "pay"),
      (2L, t(0), "browse"), (2L, t(2), "activate"), (2L, t(3), "signup"),
      (3L, t(0), "browse"),
      (4L, t(0), "activate"), (4L, t(1), "pay")
    ).toDF("user_id", "ts", "event_type")
    val row = EventOpsPack
      .funnelStepsOf(events, Seq("browse", "signup", "activate", "pay"))
      .collect().head
    val cols = Seq("n_browse", "n_signup", "n_activate", "n_pay",
      "browse_to_signup", "signup_to_activate", "activate_to_pay")
    row.schema.fieldNames.toSeq shouldBe cols
    row.getLong(0) shouldBe 3  // u1, u2, u3 browsed
    row.getLong(1) shouldBe 2  // u1, u2 signed up after browsing
    row.getLong(2) shouldBe 1  // only u1 activated AFTER signup
    row.getLong(3) shouldBe 1  // only u1 paid after activating
    row.getDouble(5) shouldBe 0.5 // signup_to_activate = 1/2
    // invalid stage lists fail loudly
    intercept[IllegalArgumentException](
      EventOpsPack.funnelStepsOf(events, Seq("browse")))
    intercept[IllegalArgumentException](
      EventOpsPack.funnelStepsOf(events, Seq("browse", "browse")))
    intercept[IllegalArgumentException]( // dots would break col() names
      EventOpsPack.funnelStepsOf(events, Seq("browse", "add.to.cart")))
  }

  behavior of "hardNegativesOf"

  it should "mine positives/negatives for an arbitrary query predicate and bound the broadcast" in {
    val dirEmb = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dirEmb/embeddings.parquet").exists())
    val emb = graft.Tables.embeddings(spark, dirEmb)
    val rows = LlmData
      .hardNegativesOf(emb, col("vec_id") % 100 === 17)
      .collect()
    rows should not be empty
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    rows.foreach { r =>
      val (qId, posId, negId) = (r.getLong(0), r.getLong(1), r.getLong(3))
      labels(posId) shouldBe labels(qId)       // positive: same label
      labels(negId) should not be labels(qId)  // hard negative: different
    }
    // empty query sets and over-bound broadcasts fail loudly
    intercept[IllegalArgumentException](
      LlmData.hardNegativesOf(emb, col("vec_id") < 0))
    intercept[IllegalArgumentException](
      LlmData.hardNegativesOf(emb, col("vec_id") >= 0, maxQueries = 10))
  }
}

private object EventOpsPackSpecHelper {
  def rfmPerTier(s: org.apache.spark.sql.SparkSession, dir: String) =
    Relational.rfmTiers(s, dir)
}
