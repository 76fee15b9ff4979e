package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  behavior of "text_winnow"

  /** Scala-side reference: per-gram polynomial hash computed directly
    * (non-rolling), window minima, distinct sorted — the definition the
    * rolling recurrence must reproduce exactly. */
  private def refFingerprint(s: String, k: Int, w: Int): Seq[Long] = {
    val P = 2147483647L
    if (s.length < k) return Seq.empty
    val hashes = (0 to s.length - k).map { i =>
      s.substring(i, i + k).foldLeft(0L)((h, c) => (h * 257 + c) % P)
    }
    val minima =
      if (hashes.length < w) Seq(hashes.min)
      else hashes.sliding(w).map(_.min).toSeq
    minima.distinct.sorted
  }

  it should "match the direct polynomial definition on varied strings" in {
    val docs = Seq("the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaa", "abcdefgh", "short", "", "repeat repeat repeat repeat")
      .toDF("t")
    val got = docs.select(col("t"), GraftFunctions.textWinnow(col("t"), 8, 4).as("fp"))
      .collect()
    got.foreach { r =>
      r.getSeq[Long](1) shouldBe refFingerprint(r.getString(0), 8, 4)
    }
  }

  it should "keep fingerprints of unchanged regions under edits" in {
    val a = "the quick brown fox jumps over the lazy dog and runs far away"
    val b = a + " EDITED TAIL CONTENT HERE" // head untouched
    val Seq(fa, fb) = Seq(a, b).toDF("t")
      .select(GraftFunctions.textWinnow(col("t"), 8, 4))
      .collect().toSeq.map(_.getSeq[Long](0).toSet)
    // winnowing guarantee: windows fully inside the unchanged prefix agree
    (fa intersect fb).size should be >= (fa.size / 2)
  }

  it should "be callable from SQL text" in {
    Seq("hello world hello world").toDF("t").createOrReplaceTempView("tw")
    val viaSql = spark.sql("SELECT text_winnow(t, 8, 4) AS fp FROM tw")
      .collect()(0).getSeq[Long](0)
    viaSql shouldBe refFingerprint("hello world hello world", 8, 4)
  }

  it should "return null for null input and [] for short input" in {
    val out = Seq[(java.lang.Long, String)]((1L, null), (2L, "abc"))
      .toDF("id", "t")
      .select(col("id"), GraftFunctions.textWinnow(col("t"), 8, 4).as("fp"))
      .orderBy("id").collect()
    out(0).isNullAt(1) shouldBe true
    out(1).getSeq[Long](1) shouldBe Seq.empty
  }
}
