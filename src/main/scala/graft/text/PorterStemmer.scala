package graft.text

/** Porter stemming algorithm — implemented from the published description
  * (M.F. Porter, "An algorithm for suffix stripping", Program 14(3), 1980).
  * The reference vendors a third-party implementation
  * (com/github/aztek/porterstemmer/PorterStemmer.scala); this is a fresh
  * implementation of the same public algorithm.
  */
object PorterStemmer {

  private def isVowelAt(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowelAt(w, i - 1)
    case _ => false
  }

  /** Measure m of the [C](VC)^m[V] decomposition of `w`. */
  private def measure(w: String): Int = {
    var m = 0
    var i = 0
    val n = w.length
    while (i < n && !isVowelAt(w, i)) i += 1 // leading consonants
    while (i < n) {
      while (i < n && isVowelAt(w, i)) i += 1 // vowel run
      if (i < n) { m += 1; while (i < n && !isVowelAt(w, i)) i += 1 }
    }
    m
  }

  private def containsVowel(w: String): Boolean =
    w.indices.exists(isVowelAt(w, _))

  private def endsDoubleConsonant(w: String): Boolean =
    w.length >= 2 && w(w.length - 1) == w(w.length - 2) && !isVowelAt(w, w.length - 1)

  /** *o — stem ends cvc where the final c is not w, x or y. */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && !isVowelAt(w, n - 3) && isVowelAt(w, n - 2) && !isVowelAt(w, n - 1) &&
      !Set('w', 'x', 'y').contains(w(n - 1))
  }

  private def replaceSuffix(w: String, suffix: String, repl: String,
                            cond: String => Boolean): Option[String] =
    if (w.endsWith(suffix)) {
      val stem = w.dropRight(suffix.length)
      if (cond(stem)) Some(stem + repl) else Some(w)
    } else None

  /** Try rules in order; first matching SUFFIX wins (even if its condition
    * fails — per the algorithm, the longest listed match blocks the rest). */
  private def firstMatch(w: String, rules: Seq[(String, String, String => Boolean)]): String =
    rules.iterator.flatMap { case (s, r, c) => replaceSuffix(w, s, r, c) }
      .nextOption().getOrElse(w)

  private val always: String => Boolean = _ => true

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var w = word

    // Step 1a
    w = firstMatch(w, Seq(
      ("sses", "ss", always), ("ies", "i", always), ("ss", "ss", always), ("s", "", always)))

    // Step 1b
    if (w.endsWith("eed")) {
      val stem = w.dropRight(3)
      if (measure(stem) > 0) w = stem + "ee"
    } else {
      val after = Seq("ed", "ing").collectFirst {
        case s if w.endsWith(s) && containsVowel(w.dropRight(s.length)) => w.dropRight(s.length)
      }
      after.foreach { stem =>
        w = stem match {
          case s if s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz") => s + "e"
          case s if endsDoubleConsonant(s) && !Set('l', 's', 'z').contains(s.last) => s.dropRight(1)
          case s if measure(s) == 1 && endsCvc(s) => s + "e"
          case s => s
        }
      }
    }

    // Step 1c
    if (w.endsWith("y") && containsVowel(w.dropRight(1))) w = w.dropRight(1) + "i"

    val m0 = (s: String) => measure(s) > 0
    val m1 = (s: String) => measure(s) > 1

    // Step 2
    w = firstMatch(w, Seq(
      ("ational", "ate", m0), ("tional", "tion", m0), ("enci", "ence", m0),
      ("anci", "ance", m0), ("izer", "ize", m0), ("abli", "able", m0),
      ("alli", "al", m0), ("entli", "ent", m0), ("eli", "e", m0),
      ("ousli", "ous", m0), ("ization", "ize", m0), ("ation", "ate", m0),
      ("ator", "ate", m0), ("alism", "al", m0), ("iveness", "ive", m0),
      ("fulness", "ful", m0), ("ousness", "ous", m0), ("aliti", "al", m0),
      ("iviti", "ive", m0), ("biliti", "ble", m0)))

    // Step 3
    w = firstMatch(w, Seq(
      ("icate", "ic", m0), ("ative", "", m0), ("alize", "al", m0),
      ("iciti", "ic", m0), ("ical", "ic", m0), ("ful", "", m0), ("ness", "", m0)))

    // Step 4
    w = firstMatch(w, Seq(
      ("al", "", m1), ("ance", "", m1), ("ence", "", m1), ("er", "", m1),
      ("ic", "", m1), ("able", "", m1), ("ible", "", m1), ("ant", "", m1),
      ("ement", "", m1), ("ment", "", m1), ("ent", "", m1),
      ("ion", "", s => measure(s) > 1 && (s.endsWith("s") || s.endsWith("t"))),
      ("ou", "", m1), ("ism", "", m1), ("ate", "", m1), ("iti", "", m1),
      ("ous", "", m1), ("ive", "", m1), ("ize", "", m1)))

    // Step 5a
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) w = stem
    }
    // Step 5b
    if (measure(w) > 1 && endsDoubleConsonant(w) && w.endsWith("l")) w = w.dropRight(1)
    w
  }
}
