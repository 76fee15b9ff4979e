package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property invariants for the winnowing rolling hash — pure function, no
  * SparkSession (the Column form delegates to the same code, covered by
  * TextExpressionsSpec and the doc_winnow oracle). */
object WinnowProps extends Properties("Winnow") {

  private val P = 2147483647L

  /** Direct (non-rolling) definition the O(n) recurrence must match. */
  private def direct(s: String, k: Int, w: Int): Seq[Long] = {
    if (s.length < k) return Seq.empty
    val hashes = (0 to s.length - k).map { i =>
      s.substring(i, i + k).foldLeft(0L)((h, c) => (h * 257 + c) % P)
    }
    val minima =
      if (hashes.length < w) Seq(hashes.min)
      else hashes.sliding(w).map(_.min).toSeq
    minima.distinct.sorted
  }

  private def fp(s: String, k: Int, w: Int): Seq[Long] = {
    val a = Winnow.fingerprint(UTF8String.fromString(s), k, w)
    (0 until a.numElements()).map(a.getLong)
  }

  private val text: Gen[String] = Gen.chooseNum(0, 200)
    .flatMap(n => Gen.listOfN(n, Gen.asciiPrintableChar)).map(_.mkString)
  private val kGen = Gen.chooseNum(1, 12)
  private val wGen = Gen.chooseNum(1, 10)

  property("rolling recurrence equals the direct polynomial definition") =
    forAll(text, kGen, wGen) { (s, k, w) => fp(s, k, w) == direct(s, k, w) }

  property("sorted, distinct, in [0, P)") = forAll(text, kGen, wGen) { (s, k, w) =>
    val f = fp(s, k, w)
    f == f.distinct.sorted && f.forall(h => h >= 0 && h < P)
  }

  property("fingerprint is a subset of all gram hashes") =
    forAll(text, kGen, wGen) { (s, k, w) =>
      val all = (0 to s.length - k).map { i =>
        s.substring(i, i + k).foldLeft(0L)((h, c) => (h * 257 + c) % P)
      }.toSet
      fp(s, k, w).forall(all.contains)
    }
}
