package graft.train

import graft.SparkSpec
import org.apache.spark.ml.linalg.Vectors

/** Numerical validation of the weighted two-row identity (SURVEY §7-M5
  * "hard/risky: Platt soft-label equivalence — validate numerically").
  *
  * Claim: training stock LogisticRegression where each margin m becomes
  * two rows (y=1, w=t) and (y=0, w=1−t) minimizes EXACTLY the soft-label
  * cross-entropy  Σ t·log(1+e^−(am+b)) + (1−t)·log(1+e^(am+b))  that the
  * reference's 762-line BinaryLogisticRegressionWithDoubleResponse fork
  * optimizes. Verified against an independent plain-Scala gradient-descent
  * minimizer of that objective.
  */
class PlattEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  /** Direct batch gradient descent on the soft-label objective. */
  private def directFit(margins: Array[Double], targets: Array[Double],
                        iters: Int = 200000, lr: Double = 0.01): (Double, Double) = {
    var a = 0.0; var b = 0.0
    var i = 0
    while (i < iters) {
      var ga = 0.0; var gb = 0.0
      var j = 0
      while (j < margins.length) {
        val p = 1.0 / (1.0 + math.exp(-(a * margins(j) + b)))
        val d = p - targets(j) // d/dz of soft-label CE
        ga += d * margins(j); gb += d
        j += 1
      }
      a -= lr * ga; b -= lr * gb
      i += 1
    }
    (a, b)
  }

  behavior of "PlattScalar soft-label identity"

  it should "match a direct minimizer of the soft-label objective" in {
    // margins with noisy labels — not separable, so the optimum is interior
    val data = Seq(
      (-3.0, 0.0), (-2.5, 0.0), (-2.0, 0.0), (-1.5, 1.0), (-1.0, 0.0),
      (-0.5, 0.0), (0.0, 1.0), (0.5, 0.0), (1.0, 1.0), (1.5, 1.0),
      (2.0, 1.0), (2.5, 0.0), (3.0, 1.0), (3.5, 1.0))
    val nPos = data.count(_._2 == 1.0)
    val nNeg = data.size - nPos
    val tPos = (nPos + 1.0) / (nPos + 2.0)
    val tNeg = 1.0 / (nNeg + 2.0)
    val targets = data.map { case (_, y) => if (y == 1.0) tPos else tNeg }.toArray
    val (aExp, bExp) = directFit(data.map(_._1).toArray, targets)

    // our estimator path: margin arrives as a rawPrediction vector [−m, m]
    val df = data.map { case (m, y) => (Vectors.dense(-m, m), y) }
      .toDF("rawPrediction", "label")
    val model = new PlattScalar().setLabelCol("label").fit(df)
    model.a(0) shouldBe aExp +- 1e-3
    model.b(0) shouldBe bExp +- 1e-3
  }
}
