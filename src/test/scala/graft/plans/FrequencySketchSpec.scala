package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FrequencySketchSpec extends SparkSpec {

  import spark.implicits._

  // skewed stream: key "hot" ~20%, "warm" ~10%, long uniform tail
  private lazy val skewed = (1 to 10000).map { i =>
    if (i % 5 == 0) "hot" else if (i % 10 == 1) "warm" else s"tail_${i % 997}"
  }.toDF("k").repartition(8)

  behavior of "FrequencySketch"

  it should "surface every key above the n/(k+1) frequency bound" in {
    val n = 10000L
    val k = 64
    val candidates = FrequencySketch.misraGriesCandidates(skewed, "k", k)
      .as[(String, Long)].collect().toMap
    val exact = skewed.groupBy("k").count().as[(String, Long)].collect().toMap
    val bound = n / (k + 1)
    // completeness: every truly-frequent key is a candidate
    exact.filter(_._2 > bound).keys.foreach { key =>
      withClue(s"frequent key $key missing from candidates:") {
        candidates.contains(key) shouldBe true
      }
    }
    // undercount bound: est ≤ true ≤ est + n/(k+1)
    candidates.foreach { case (key, est) =>
      est should be <= exact(key)
      exact(key) should be <= (est + bound)
    }
    // bounded output: at most k counters per partition survive
    candidates.size should be <= (k * 8)
  }

  it should "recover exact heavy-hitter counts end-to-end" in {
    val hh = FrequencySketch.heavyHitters(skewed, "k", k = 64, minCount = 500L)
      .as[(String, Long)].collect().toMap
    hh shouldBe Map("hot" -> 2000L, "warm" -> 1000L)
  }

  it should "agree with Spark's built-in count-min sketch on overestimates" in {
    // CMS errs in the OPPOSITE direction of Misra-Gries: estimates are
    // always ≥ true count (and ≤ true + eps*n w.h.p.) — the pair brackets
    // the true frequency from both sides
    val cms = skewed.stat.countMinSketch(col("k"), eps = 0.001, confidence = 0.99,
      seed = 42)
    val exact = skewed.groupBy("k").count().as[(String, Long)].collect().toMap
    Seq("hot", "warm", "tail_1").foreach { key =>
      cms.estimateCount(key) should be >= exact(key)
      cms.estimateCount(key) should be <= (exact(key) + (0.001 * 10000).toLong + 1)
    }
  }
}
