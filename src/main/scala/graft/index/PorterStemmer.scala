package graft.index

/** The Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3), 1980 — the public-domain definition, as
  * Lucene's PorterStemFilter implements it), for the `english` analyzer
  * (Milvus's built-in `english` = standard tokenize + lowercase +
  * English stop words + Porter stem).
  *
  * Implemented from the paper's rule tables verbatim: a word is
  * [C](VC)^m[V]; rules fire on the LONGEST matching suffix of each
  * step, guarded by conditions on the remaining stem (`m` — the
  * measure, `*v*` — contains a vowel, `*d` — double consonant, `*o` —
  * ends cvc with the final c not w/x/y). Deterministic, pure, and
  * applied identically executor-side (postings build/append) and
  * driver-side (query-term analysis) — the bit-for-bit contract every
  * index artifact in this engine keeps.
  *
  * Input is expected lowercase (the analyzer lowercases first); words
  * shorter than 3 letters return unchanged (the paper's K ≥ 2 cutoff,
  * matching Lucene). */
object PorterStemmer {

  def stem(word: String): String = {
    if (word.length < 3) return word
    var w = word
    w = step1a(w)
    w = step1b(w)
    w = step1c(w)
    w = step2(w)
    w = step3(w)
    w = step4(w)
    w = step5(w)
    w
  }

  // y is a consonant at position 0 or after a vowel's consonant rule:
  // a letter is a consonant if not aeiou, and y is a consonant iff the
  // previous letter is a vowel... per the paper: y is a vowel when
  // preceded by a consonant, a consonant when preceded by a vowel or at
  // the start.
  private def isConsonant(s: String, i: Int): Boolean = s.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isConsonant(s, i - 1)
    case _ => true
  }

  /** m of [C](VC)^m[V] over the whole string. */
  private def measure(s: String): Int = {
    var m = 0
    var i = 0
    val n = s.length
    while (i < n && isConsonant(s, i)) i += 1 // leading [C]
    while (i < n) {
      while (i < n && !isConsonant(s, i)) i += 1 // V run
      if (i < n) { // a C run after a V run closes one VC
        m += 1
        while (i < n && isConsonant(s, i)) i += 1
      }
    }
    m
  }

  private def containsVowel(s: String): Boolean =
    s.indices.exists(i => !isConsonant(s, i))

  private def endsDoubleC(s: String): Boolean =
    s.length >= 2 && s.charAt(s.length - 1) == s.charAt(s.length - 2) &&
      isConsonant(s, s.length - 1)

  /** *o: stem ends cvc where the final c is not w, x, or y. */
  private def endsCvcNotWxy(s: String): Boolean = {
    val n = s.length
    n >= 3 && isConsonant(s, n - 3) && !isConsonant(s, n - 2) &&
      isConsonant(s, n - 1) && !"wxy".contains(s.charAt(n - 1))
  }

  private def step1a(w: String): String =
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ies")) w.dropRight(2)
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s")) w.dropRight(1)
    else w

  private def step1b(w: String): String = {
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w.dropRight(1) else w
    } else {
      val stripped =
        if (w.endsWith("ed") && containsVowel(w.dropRight(2)))
          Some(w.dropRight(2))
        else if (w.endsWith("ing") && containsVowel(w.dropRight(3)))
          Some(w.dropRight(3))
        else None
      stripped.fold(w) { s =>
        if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s + "e"
        else if (endsDoubleC(s) && !"lsz".contains(s.last)) s.dropRight(1)
        else if (measure(s) == 1 && endsCvcNotWxy(s)) s + "e"
        else s
      }
    }
  }

  private def step1c(w: String): String =
    if (w.endsWith("y") && containsVowel(w.dropRight(1)))
      w.dropRight(1) + "i"
    else w

  // (suffix, replacement) tables; rules fire on the longest matching
  // suffix with measure(stem) > threshold. Scanning in declared order
  // with a starts-with-longest layout matches the paper (within each
  // step no suffix is a proper suffix of an earlier one that would
  // shadow it — the orders below are the paper's own).
  private val Step2Rules = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
    "anci" -> "ance", "izer" -> "ize", "abli" -> "able", "alli" -> "al",
    "entli" -> "ent", "eli" -> "e", "ousli" -> "ous", "ization" -> "ize",
    "ation" -> "ate", "ator" -> "ate", "alism" -> "al",
    "iveness" -> "ive", "fulness" -> "ful", "ousness" -> "ous",
    "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private val Step3Rules = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private def applyRules(w: String, rules: Seq[(String, String)]): String = {
    rules.foreach { case (suf, rep) =>
      if (w.endsWith(suf)) {
        val stem = w.dropRight(suf.length)
        return if (measure(stem) > 0) stem + rep else w
      }
    }
    w
  }

  private def step2(w: String): String = applyRules(w, Step2Rules)
  private def step3(w: String): String = applyRules(w, Step3Rules)

  private val Step4Suffixes = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  private def step4(w: String): String = {
    // longest matching suffix wins (e.g. "ement" before "ment" before
    // "ent" — the list is ordered so the first ENDING match is the
    // longest because no earlier entry is a shorter suffix of a later
    // one that also matches... except the ment family, where order
    // handles it: ement precedes ment precedes ent)
    Step4Suffixes.foreach { suf =>
      if (w.endsWith(suf)) {
        val stem = w.dropRight(suf.length)
        return if (measure(stem) > 1 &&
            (suf != "ion" || (stem.nonEmpty && "st".contains(stem.last))))
          stem
        else w
      }
    }
    w
  }

  private def step5(w: String): String = {
    // 5a: drop a final e at m>1, or at m=1 when the stem is not *o
    val a =
      if (w.endsWith("e")) {
        val stem = w.dropRight(1)
        val m = measure(stem)
        if (m > 1 || (m == 1 && !endsCvcNotWxy(stem))) stem else w
      } else w
    // 5b: m>1, *d and *L → single letter
    if (measure(a) > 1 && endsDoubleC(a) && a.endsWith("ll")) a.dropRight(1)
    else a
  }
}
