package graft.text

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants for the text operators — pure functions, so
  * they check without a SparkSession (the Column forms delegate to the
  * same algorithms, covered by TransformersSpec).
  */
object PorterStemmerProps extends Properties("PorterStemmer") {

  private val word: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)

  property("never empty, never longer than the input") = forAll(word) { w =>
    val s = PorterStemmer.stem(w)
    s.nonEmpty && s.length <= w.length
  }

  property("total: no exceptions on arbitrary ascii strings") =
    forAll(Gen.asciiPrintableStr) { s0 =>
      val s = s0.toLowerCase
      PorterStemmer.stem(s) != null
    }

  property("words of length <= 2 are untouched") =
    forAll(Gen.listOfN(2, Gen.alphaLowerChar).map(_.mkString)) { w =>
      PorterStemmer.stem(w) == w
    }

  property("stable: equal inputs stem equally") = forAll(word) { w =>
    PorterStemmer.stem(w) == PorterStemmer.stem(w)
  }

  property("plural s-forms never keep their trailing s (non-ss)") =
    // e-final words are exempt: step 5a deletes the final e and can expose
    // an s ("houses" → "hous" is correct Porter output). Words ending in s
    // are exempt by the property's own premise (non-plural ss/es forms).
    forAll(word.suchThat(w => w.length >= 3 && !w.endsWith("s") && !w.endsWith("e"))) { w =>
      // words <= 2 chars (stem-side guard) are exempt by the algorithm
      val s = PorterStemmer.stem(w + "s")
      !s.endsWith("s") || s.endsWith("ss")
    }
}
