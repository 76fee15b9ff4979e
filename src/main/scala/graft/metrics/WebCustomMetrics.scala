package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Web-journey "hotlead" simulation metrics
  * (ref: core/metrics/WebCustomMetricsEvaluator.scala:67-189).
  *
  * Semantics: a visitor becomes a hotlead on the FIRST page whose score
  * clears that page's threshold; pages ≥ nPages accumulate into the last
  * page (the reference's `>=` rule, WebCustomMetricsEvaluator.scala:149-167).
  * Per page the simulation reports how many visitors fired there and how
  * many of those converted, against corpus totals.
  *
  * Scale: two hash aggregates (visitor-level min/max, then page-level
  * counts) + a broadcast single-row totals join. No windows, no collect —
  * the visitor aggregate shuffles once on the visitor key.
  */
object WebCustomMetrics {

  /** @param thresholds per-page probability threshold (1-based page →
    *                   threshold); pages missing from the map use `default`.
    */
  def simulate(scored: DataFrame, visitorCol: String, pageCol: String,
               probCol: String, responseCol: String,
               nPages: Int, default: Double,
               thresholds: Map[Int, Double] = Map.empty): DataFrame = {
    val pageAdj = least(col(pageCol), lit(nPages))
    val thr = thresholds.foldLeft(lit(default)) { case (acc, (p, t)) =>
      when(pageAdj === p, t).otherwise(acc)
    }
    val totals = scored.agg(
      countDistinct(col(visitorCol)).as("total_visitors"),
      countDistinct(when(col(responseCol) === 1, col(visitorCol))).as("total_positives"))

    val visitorLevel = scored
      .filter(col(probCol) >= thr)
      .select(col(visitorCol).as("visitor"), pageAdj.as("page"),
        col(responseCol).cast("long").as("resp"))
      .groupBy("visitor")
      .agg(min("page").as("hotlead_page"), max("resp").as("converted"))

    visitorLevel.groupBy(col("hotlead_page").as("page"))
      .agg(count(lit(1)).as("hotleads"), sum("converted").as("captured"))
      .crossJoin(broadcast(totals))
      .select(col("page"), col("hotleads"), col("captured"),
        (col("hotleads") / col("total_visitors")).as("hotlead_rate"),
        (col("captured") / col("total_positives")).as("capture_rate"))
  }
}
