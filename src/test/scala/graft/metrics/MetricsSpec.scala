package graft.metrics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  behavior of "StandardMetrics"

  private val preds = Seq(
    ("a", "a"), ("a", "a"), ("a", "b"),
    ("b", "b"), ("b", "a"), ("c", "c")).toDF("label", "pred")

  it should "compute the confusion matrix" in {
    val m = StandardMetrics.confusion(preds, "label", "pred")
      .as[(String, String, Long)].collect().toSet
    m should contain allOf (("a", "a", 2L), ("a", "b", 1L), ("b", "b", 1L),
      ("b", "a", 1L), ("c", "c", 1L))
  }

  it should "compute per-label precision/recall/F1 with hand values" in {
    val rows = StandardMetrics.perLabel(preds, "label", "pred")
      .orderBy("class").collect()
    val a = rows(0) // tp=2 support=3 predTotal=3
    a.getAs[Double]("precision") shouldBe 2.0 / 3 +- 1e-9
    a.getAs[Double]("recall") shouldBe 2.0 / 3 +- 1e-9
    a.getAs[Double]("f1") shouldBe 2.0 / 3 +- 1e-9
    val c = rows(2) // tp=1 support=1 predTotal=1
    c.getAs[Double]("f1") shouldBe 1.0 +- 1e-9
  }

  it should "compute accuracy and weighted summaries" in {
    val r = StandardMetrics.weightedSummary(preds, "label", "pred").head()
    r.getAs[Double]("accuracy") shouldBe 4.0 / 6 +- 1e-9
  }

  it should "compute AUROC by rank-sum with average-rank tie handling" in {
    val df = Seq((0.9, 1), (0.8, 0), (0.7, 1), (0.6, 0)).toDF("s", "y")
    StandardMetrics.auroc(df, "y", "s").head().getDouble(0) shouldBe 0.75 +- 1e-9
    // all-ties → 0.5 exactly (average ranks)
    val ties = Seq((0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)).toDF("s", "y")
    StandardMetrics.auroc(ties, "y", "s").head().getDouble(0) shouldBe 0.5 +- 1e-9
    // perfect separation → 1.0
    val sep = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)).toDF("s", "y")
    StandardMetrics.auroc(sep, "y", "s").head().getDouble(0) shouldBe 1.0 +- 1e-9
  }

  it should "find the best F-beta threshold" in {
    val df = Seq((0.9, 1), (0.8, 1), (0.7, 0), (0.6, 1), (0.5, 0))
      .toDF("s", "y")
    val best = StandardMetrics.bestThreshold(df, "y", "s", beta = 1.0).head()
    // t=0.6: P=3/4 R=1 F1=6/7 beats t=0.8 (P=1 R=2/3 F1=0.8) and t=0.9
    best.getAs[Double]("thresh") shouldBe 0.6
    best.getAs[Double]("fbeta") shouldBe 6.0 / 7 +- 1e-9
  }

  behavior of "ModelHealth"

  it should "yield zero PSI for identical distributions" in {
    val df = (1 to 100).map(_.toDouble).toDF("x")
    val psi = ModelHealth.psiTotal(
      ModelHealth.psiEquidistant(df, df, "x", 10)).head().getDouble(0)
    psi shouldBe 0.0 +- 1e-12
  }

  it should "detect a shifted distribution with positive PSI" in {
    val base = (1 to 100).map(_.toDouble).toDF("x")
    val cur = (41 to 140).map(_.toDouble).toDF("x")
    val psi = ModelHealth.psiTotal(
      ModelHealth.psiEquidistant(base, cur, "x", 10)).head().getDouble(0)
    psi should be > 10.0
  }

  it should "spread quantile-PSI base mass near-uniformly across buckets" in {
    // regression for a largest-split-first when() chain that collapsed
    // every bucket below the top split into one: on 1..100 with k=10
    // deciles, each base bucket must carry ~10% of the mass
    val base = (1 to 100).map(_.toDouble).toDF("x")
    val cur = (1 to 100).map(_.toDouble).toDF("x")
    val rows = ModelHealth.psiQuantile(base, cur, "x", 10)
      .collect()
    rows.length shouldBe 10
    rows.foreach { r =>
      r.getAs[Double]("p") shouldBe 0.1 +- 0.02
      r.getAs[Double]("q") shouldBe 0.1 +- 0.02
    }
    val psi = ModelHealth.psiTotal(
      ModelHealth.psiQuantile(base, cur, "x", 10)).head().getDouble(0)
    psi shouldBe 0.0 +- 1e-12
  }

  it should "reproduce the exact-quantile PSI against a driver-side replay" in {
    // psiExact's distributed rank selection vs an in-memory replay of the
    // same rule (element at rank ceil(i·(1/k)·n), bucket = #splits ≤ x,
    // shares over the joined buckets)
    val baseVals = (1 to 97).map(i => (i * 37 % 101).toDouble)
    val curVals = (1 to 151).map(i => (i * 53 % 97).toDouble)
    val base = baseVals.toDF("x")
    val cur = curVals.toDF("x")
    val k = 10
    val n = baseVals.size
    val sorted = baseVals.sorted
    val splits = (1 until k)
      .map(i => sorted(math.max(0, math.ceil(i * (1.0 / k) * n).toInt - 1)))
      .distinct.sorted
    def bucket(x: Double) = splits.count(_ <= x)
    val bb = baseVals.groupBy(bucket).view.mapValues(_.size).toMap
    val cc = curVals.groupBy(bucket).view.mapValues(_.size).toMap
    val common = bb.keySet intersect cc.keySet
    val tb = common.toSeq.map(bb).sum.toDouble
    val tc = common.toSeq.map(cc).sum.toDouble
    val expect = common.toSeq.map { b =>
      val p = bb(b) / tb; val q = cc(b) / tc
      (p - q) * math.log(p / q) * 100
    }.sum
    val actual = ModelHealth.psiTotal(
      ModelHealth.psiExact(base, cur, "x", k)).head().getDouble(0)
    actual shouldBe expect +- 1e-9
  }

  it should "compute VSI with hand values" in {
    val base = Seq("a", "a", "b", "b").toDF("v")
    val cur = Seq("a", "a", "a", "b").toDF("v")
    val vsi = ModelHealth.vsi(base, cur, "v").head().getAs[Double]("vsi")
    val expect = (0.5 - 0.75) * math.log(0.5 / 0.75) * 100 +
      (0.5 - 0.25) * math.log(0.5 / 0.25) * 100
    vsi shouldBe expect +- 1e-9
  }

  it should "report value drift as set differences" in {
    val base = Seq("a", "b", "gone").toDF("v")
    val cur = Seq("a", "b", "new").toDF("v")
    val drift = ModelHealth.valueDrift(base, cur, "v")
      .as[(String, String)].collect().toSet
    drift shouldBe Set(("gone", "missing_in_current"), ("new", "new_in_current"))
  }

  behavior of "WebCustomMetrics"

  it should "simulate hotleads with first-page attribution and page accumulation" in {
    // visitor 1 fires on page 2 (first clearing 0.7) and converts;
    // visitor 2 fires on page 7 → accumulated into page 5; no conversion;
    // visitor 3 never fires
    val df = Seq(
      (1L, 1L, 0.3, 0), (1L, 2L, 0.8, 0), (1L, 3L, 0.9, 1),
      (2L, 7L, 0.75, 0),
      (3L, 1L, 0.2, 1)).toDF("vis", "pg", "prob", "resp")
    val out = WebCustomMetrics.simulate(df, "vis", "pg", "prob", "resp",
        nPages = 5, default = 0.7)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map { case (p, h, c, hr, cr) => (p, (h, c, hr, cr)) }.toMap
    out(2L) shouldBe ((1L, 1L, 1.0 / 3, 1.0 / 2)) // visitor 1
    out(5L) shouldBe ((1L, 0L, 1.0 / 3, 0.0))     // visitor 2, page 7 → 5
    out.keySet shouldBe Set(2L, 5L)
  }

  it should "gate hotleads on both probability and time-on-page thresholds" in {
    import org.apache.spark.ml.linalg.Vectors
    val df = Seq(
      (Vectors.dense(0.2, 0.8), 1L, 50.0),  // prob ok, TOP ok
      (Vectors.dense(0.2, 0.8), 1L, 5.0),   // prob ok, TOP too low
      (Vectors.dense(0.9, 0.1), 1L, 50.0),  // prob too low
      (Vectors.dense(0.2, 0.8), 2L, 5.0))   // page 2: no TOP threshold set
    .toDF("probability", "pg", "top")
    val out = new graft.publish.HotleadTransformer()
      .setPageCol("pg").setDefaultThreshold(0.5)
      .setTopCol("top").setTopThresholds(Map(1 -> 10.0))
      .transform(df)
      .select("isHotLead").as[Int].collect().toSeq
    out shouldBe Seq(1, 0, 0, 1)
  }
}
