package graft.metrics

import graft.plans.GlobalRank
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Standard classification metrics as pure DataFrame aggregations
  * (ref: core/metrics/StandardMetricsEvaluator.scala:66-309, which uses
  * mllib's RDD-based BinaryClassificationMetrics / MulticlassMetrics).
  *
  * Re-expressed Spark-first: every metric is a declarative plan over hash
  * aggregates — partial aggregation, codegen, no RDD round-trips, no
  * `.collect()`. Rank statistics (AUROC, F-measure-by-threshold) first
  * group by the SCORE VALUE, so the cumulative pass runs over distinct
  * scores — cardinality ≪ rows (bounded by rounding, e.g. probabilities
  * have ≤ ~1e7 distinct doubles in practice; bucket scores first if not) —
  * never over the full fact table; and even that pass is partition-parallel
  * ([[graft.plans.GlobalRank.withRunningSums]] range-partition prefix sums,
  * not an unpartitioned `Window.orderBy` that serializes into one task).
  */
object StandardMetrics {

  /** Confusion matrix: one row per (label, prediction) pair. */
  def confusion(df: DataFrame, labelCol: String, predCol: String): DataFrame =
    df.groupBy(col(labelCol), col(predCol)).agg(count(lit(1)).as("n"))

  /** Per-label precision/recall/F1 + support (one row per actual label).
    * Predicted-only classes contribute to false positives via the predicted
    * totals but don't get their own row — matching MulticlassMetrics. */
  def perLabel(df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val cnt = confusion(df, labelCol, predCol).cache()
    val actual = cnt.groupBy(col(labelCol).as("class")).agg(sum("n").as("support"))
    val predicted = cnt.groupBy(col(predCol).as("class")).agg(sum("n").as("predTotal"))
    val tp = cnt.filter(col(labelCol) === col(predCol))
      .select(col(labelCol).as("class"), col("n").as("tp"))
    val joined = actual
      .join(tp, Seq("class"), "left")
      .join(predicted, Seq("class"), "left")
      .na.fill(0L, Seq("tp", "predTotal"))
    val p = col("tp") / col("predTotal")
    val r = col("tp") / col("support")
    joined.select(
      col("class"), col("support"), col("tp"), col("predTotal"),
      coalesce(when(col("predTotal") > 0, p), lit(0.0)).as("precision"),
      (col("tp") / col("support")).as("recall"),
      coalesce(when(col("tp") > 0, lit(2.0) * p * r / (p + r)), lit(0.0)).as("f1"))
  }

  /** The reference's confusion-matrix text block: a tab-separated
    * Intent/TP/FP/Precision/Recall table, one line per actual label
    * (ref: StandardMetricsEvaluator.scala:210-229, which builds exactly
    * this header + rows and writes them via a 1-partition text write; its
    * `.toInt` truncation of precision/recall discards the value, so they
    * are emitted at 4 dp here). Driver state is O(labels). */
  def confusionText(df: DataFrame, labelCol: String, predCol: String): Seq[String] = {
    val rows = perLabel(df, labelCol, predCol)
      .withColumn("fp", col("predTotal") - col("tp"))
      .orderBy("class").collect()
    "Intent\t\tTrue Positive\t\tFalse Positive\t\tPrecision\t\tRecall" +:
      rows.toSeq.map { r =>
        val p = r.getAs[Double]("precision")
        val rc = r.getAs[Double]("recall")
        f"${r.get(0)}\t\t${r.getAs[Long]("tp")}\t\t${r.getAs[Long]("fp")}\t\t$p%.4f\t\t$rc%.4f"
      }
  }

  /** Single-row summary: accuracy + support-weighted precision/recall/F1. */
  def weightedSummary(df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val pl = perLabel(df, labelCol, predCol)
    pl.agg(
      (sum("tp") / sum("support")).as("accuracy"),
      (sum(col("precision") * col("support")) / sum("support")).as("weightedPrecision"),
      (sum(col("recall") * col("support")) / sum("support")).as("weightedRecall"),
      (sum(col("f1") * col("support")) / sum("support")).as("weightedF1"))
  }

  /** Per-distinct-score counts with positives — shared base for the rank
    * statistics. `scoreCol` ascending. */
  private def byScore(df: DataFrame, labelCol: String, scoreCol: String): DataFrame =
    df.groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).as("c"), sum(col(labelCol).cast("double")).as("pos"))

  /** AUROC via the rank-sum (Mann-Whitney U) identity with average ranks
    * for ties: AUROC = (Σ ranks₊ − n₊(n₊+1)/2) / (n₊ n₋). Exact — identical
    * to the trapezoidal ROC integral mllib computes. One shuffle (groupBy
    * score) + one ordered window over DISTINCT scores only. */
  /** Reliability-diagram data (model calibration): scores normalized to
    * [0, 1] by the max, cut into `bins` equal-width buckets, each with its
    * mean predicted value and observed positive rate — a calibrated model
    * tracks the diagonal. One broadcast max + one keyed agg; no window. */
  def calibrationBins(df: DataFrame, labelCol: String, scoreCol: String,
                      bins: Int = 10): DataFrame = {
    val mx = df.agg(max(col(scoreCol)).cast("double").as("__mx"))
    df.crossJoin(broadcast(mx))
      .withColumn("__p", col(scoreCol) / col("__mx"))
      .withColumn("bin",
        least(lit(bins - 1), floor(col("__p") * bins)).cast("int"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        avg("__p").as("mean_pred"),
        avg(col(labelCol).cast("double")).as("frac_pos"))
  }

  /** Isotonic (non-parametric, monotone) calibration — the PAV fit via its
    * minimax identity, computed over pre-aggregated reliability bins:
    *   iso(b) = max_{i ≤ b} min_{j ≥ b} mean(y[i..j])
    * (Barlow et al. 1972 — the closed form of pool-adjacent-violators).
    *
    * The corpus collapses to `bins` rows FIRST (one keyed agg, identical
    * to [[calibrationBins]]); the minimax then runs on that O(bins) frame
    * with broadcast range self-joins — O(bins³) pairs of a ≤32-row frame,
    * nothing quadratic in the data. Every pooled mean is an
    * integer-positives / integer-count ratio, so the fit is bit-identical
    * in any IEEE engine — no rounding tolerance needed on the fit itself.
    * Complements [[graft.train.PlattScalar]]: Platt is the parametric
    * (sigmoid) calibrator, this is the distribution-free one. */
  def isotonicCalibration(df: DataFrame, labelCol: String, scoreCol: String,
                          bins: Int = 20): DataFrame = {
    val mx = df.agg(max(col(scoreCol)).cast("double").as("__mx"))
    val b = df.crossJoin(broadcast(mx))
      // a non-positive score ceiling makes __p meaningless (null or
      // sign-flipped for every row) — fail loudly instead of returning a
      // silently-wrong fit. assert_true yields null on success, so the
      // division only evaluates behind the guard.
      .withColumn("__p", when(
        assert_true(col("__mx") > 0,
          lit(s"isotonicCalibration: max($scoreCol) must be > 0")).isNull,
        col(scoreCol) / col("__mx")))
      // clamp BOTH ends like ModelHealth's bucketing: negative scores
      // otherwise land on negative bin ids and vanish from the fit
      .withColumn("bin",
        least(lit(bins - 1), greatest(lit(0), floor(col("__p") * bins)))
          .cast("int"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), avg("__p").as("mean_pred"),
        sum(col(labelCol).cast("long")).as("sy"))
      .cache()
    // inclusive prefix sums over the tiny bin frame (self-join, no window)
    val cum = b.as("x")
      .join(broadcast(b.select(col("bin").as("b2"), col("n").as("n2"),
        col("sy").as("sy2"))), col("b2") <= col("bin"))
      .groupBy(col("bin"), col("n"), col("sy"))
      .agg(sum("n2").as("cn"), sum("sy2").as("cs"))
      .select(col("bin"), col("cn"), col("cs"),
        (col("cn") - col("n")).as("pcn"), (col("cs") - col("sy")).as("pcs"))
    // pooled means over every bin range [i, j]
    val pairs = cum.select(col("bin").as("i"), col("pcn"), col("pcs"))
      .join(broadcast(cum.select(col("bin").as("j"), col("cn"), col("cs"))),
        col("i") <= col("j"))
      .select(col("i"), col("j"),
        ((col("cs") - col("pcs")).cast("double") /
          (col("cn") - col("pcn"))).as("pool"))
    val iso = b.select(col("bin").as("__b"))
      .join(broadcast(pairs), col("i") <= col("__b") && col("j") >= col("__b"))
      .groupBy(col("__b"), col("i")).agg(min("pool").as("mn"))
      .groupBy(col("__b")).agg(max("mn").as("iso_fit"))
    b.join(iso, col("bin") === col("__b"))
      .select(col("bin"), col("n"), col("mean_pred"),
        (col("sy").cast("double") / col("n")).as("frac_pos"), col("iso_fit"))
  }

  /** Cumulative-gains (lift) deciles: rank by score DESC into 10 exact
    * global deciles via the two-pass range sort (no single-partition
    * window), then per-decile positives and the cumulative capture rate —
    * "the top k% of scores captures X% of positives", the campaign-
    * targeting read of a binary scorer. The cumulative step is a
    * decile≤decile self-join on the 10-row summary, not a global window. */
  def gainsDeciles(df: DataFrame, labelCol: String, scoreCol: String,
                   tieCol: String): DataFrame = {
    val (ranked, rankedP) = graft.plans.GlobalRank.withNtilePersisted(
      df, Seq(col(scoreCol).desc, col(tieCol)), 10, "decile")
    // tiny (10 rows): eagerly materialized for both sides of the
    // cumulative self-join, which also lets the ntile sort cache be
    // released HERE (unpersist on the exact persisted handle — on the
    // derived frame it would be a sameResult-miss no-op)
    val per = graft.plans.Eager.checkpoint(
      ranked.groupBy("decile")
        .agg(count(lit(1)).as("n"),
          sum(col(labelCol).cast("long")).as("n_pos"))) { rankedP.unpersist() }
    val tot = per.agg(sum("n_pos").as("__tot"))
    per.as("a")
      .join(per.select(col("decile").as("__d"), col("n_pos").as("__p")),
        col("__d") <= col("decile"))
      .groupBy("decile", "n", "n_pos")
      .agg(sum("__p").as("cum_pos"))
      .crossJoin(broadcast(tot))
      .withColumn("cum_capture", col("cum_pos") / col("__tot"))
      .select("decile", "n", "n_pos", "cum_pos", "cum_capture")
  }

  /** Scalar calibration summary: ECE (expected calibration error — the
    * bin-weighted |mean_pred − frac_pos| over the reliability bins) and
    * the Brier score (mean squared error of the normalized score against
    * the outcome). Rides [[calibrationBins]] for ECE; Brier is one more
    * column of the same corpus agg. */
  def calibrationSummary(df: DataFrame, labelCol: String, scoreCol: String,
                         bins: Int = 10): DataFrame = {
    val mx = df.agg(max(col(scoreCol)).cast("double").as("__mx"))
    val scored = df.crossJoin(broadcast(mx))
      .withColumn("__p", col(scoreCol) / col("__mx"))
      .withColumn("__y", col(labelCol).cast("double"))
    val brier = scored.agg(count(lit(1)).as("n"),
      avg(pow(col("__p") - col("__y"), 2)).as("brier"))
    val ece = calibrationBins(df, labelCol, scoreCol, bins)
      .agg(sum(col("n") * abs(col("mean_pred") - col("frac_pos"))).as("__w"),
        sum("n").as("__n"))
      .select((col("__w") / col("__n")).as("ece"))
    brier.crossJoin(broadcast(ece)).select("n", "brier", "ece")
  }

  def auroc(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val g = byScore(df, labelCol, scoreCol)
    val ranked = GlobalRank.withRunningSums(g, Seq(col("s")), Seq("c" -> "__cum"))
      .withColumn("avgrank", col("__cum") - col("c") + (col("c") + 1) / 2.0)
    ranked.agg(
      sum(col("pos") * col("avgrank")).as("sr"),
      sum("pos").as("np"), sum("c").as("n"))
      .select(((col("sr") - col("np") * (col("np") + 1) / 2.0) /
        (col("np") * (col("n") - col("np")))).as("auroc"))
  }

  /** Precision / recall / F_β at every distinct score threshold (predict
    * positive when score ≥ t). Ref: fMeasureByThreshold with β=2 feeding the
    * best-threshold search (WebCustomMetricsEvaluator.scala:38-65). */
  def fMeasureByThreshold(df: DataFrame, labelCol: String, scoreCol: String,
                          beta: Double): DataFrame = {
    val g = byScore(df, labelCol, scoreCol)
    val b2 = beta * beta
    val totals = g.agg(sum("pos").as("npos"))
    GlobalRank.withRunningSums(g, Seq(col("s").desc),
        Seq("pos" -> "tp", "c" -> "cnt"))
      .crossJoin(broadcast(totals))
      .select(
        col("s").as("thresh"),
        (col("tp") / col("cnt")).as("precision"),
        (col("tp") / col("npos")).as("recall"))
      .withColumn("fbeta",
        when(col("precision") + col("recall") > 0,
          (lit(1 + b2) * col("precision") * col("recall")) /
            (lit(b2) * col("precision") + col("recall"))).otherwise(lit(0.0)))
  }

  /** The best-F_β threshold row (deterministic tie-break on the threshold). */
  def bestThreshold(df: DataFrame, labelCol: String, scoreCol: String,
                    beta: Double): DataFrame =
    fMeasureByThreshold(df, labelCol, scoreCol, beta)
      .orderBy(desc("fbeta"), asc("thresh")).limit(1)
}
