package graft.core

/** Pure-JVM string comparators with the semantics of Duke's
  * `no.priv.garshol.duke.comparators.*` (SURVEY.md §2.4, formulas §8.2) — the
  * similarity layer the reference plugin dispatches to reflectively
  * (`[U EntityResolutionScript.java#ctor]`, `[D Comparator.java]`).
  *
  * All functions: null-safe at the caller (Catalyst wrappers are null-intolerant),
  * total on non-null input, return similarity in [0,1]. Static forwarders let
  * janino-generated code call them directly, keeping whole-stage codegen intact.
  */
object Similarity {

  /** 1.0 iff equal — Duke ExactComparator `[D comparators/ExactComparator.java]`. */
  def exact(s1: String, s2: String): Double = if (s1 == s2) 1.0 else 0.0

  // ---------------------------------------------------------------- Jaro-Winkler

  /** Jaro similarity, standard formulation (SURVEY.md §8.2): match window
    * floor(max/2)-1, transpositions t counted as half the out-of-order matches.
    */
  def jaro(s1: String, s2: String): Double = {
    if (s1.isEmpty && s2.isEmpty) return 1.0
    if (s1.isEmpty || s2.isEmpty) return 0.0
    if (s1 == s2) return 1.0
    val win = math.max(0, math.max(s1.length, s2.length) / 2 - 1)
    val m1 = new Array[Boolean](s1.length)
    val m2 = new Array[Boolean](s2.length)
    var m = 0
    var i = 0
    while (i < s1.length) {
      val lo = math.max(0, i - win)
      val hi = math.min(s2.length - 1, i + win)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars compared in order
    var t = 0
    var k = 0
    i = 0
    while (i < s1.length) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    // transposition count floors the half-count (t/2 integer), matching the
    // widespread implementations (commons-text, rapidfuzz/DuckDB) — pinned by
    // the golden vectors, which are unaffected (their mismatch counts are even)
    val tr = (t / 2).toDouble
    (m.toDouble / s1.length + m.toDouble / s2.length + (m - tr) / m) / 3.0
  }

  /** Jaro-Winkler `[D comparators/JaroWinkler.java]`: jw = j + l*p*(1-j),
    * common-prefix length l <= 4, p = 0.1 (SURVEY.md §8.2). No boost threshold —
    * the prefix bonus always applies, pinned by golden tests.
    */
  def jaroWinkler(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    var l = 0
    val max = math.min(4, math.min(s1.length, s2.length))
    while (l < max && s1.charAt(l) == s2.charAt(l)) l += 1
    j + l * 0.1 * (1 - j)
  }

  /** Token-split both sides, per-token best Jaro-Winkler, symmetric mean —
    * Duke JaroWinklerTokenized `[D comparators/JaroWinklerTokenized.java]`.
    */
  def jaroWinklerTokenized(s1: String, s2: String): Double = {
    val t1 = s1.split("\\s+").filter(_.nonEmpty)
    val t2 = s2.split("\\s+").filter(_.nonEmpty)
    if (t1.isEmpty || t2.isEmpty) return if (t1.isEmpty && t2.isEmpty) 1.0 else 0.0
    def dir(a: Array[String], b: Array[String]): Double =
      a.map(x => b.map(y => jaroWinkler(x, y)).max).sum / a.length
    (dir(t1, t2) + dir(t2, t1)) / 2.0
  }

  // ---------------------------------------------------------------- Levenshtein

  /** Plain edit distance (two-row DP). */
  def levenshtein(s1: String, s2: String): Int = {
    if (s1 == s2) return 0
    if (s1.isEmpty) return s2.length
    if (s2.isEmpty) return s1.length
    var prev = Array.tabulate(s2.length + 1)(identity)
    var cur = new Array[Int](s2.length + 1)
    var i = 1
    while (i <= s1.length) {
      cur(0) = i
      var j = 1
      while (j <= s2.length) {
        val cost = if (s1.charAt(i - 1) == s2.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(s2.length)
  }

  /** Duke Levenshtein `[D comparators/Levenshtein.java]` (SURVEY.md §8.2):
    * length-ratio early exit (min/max <= 0.5 -> 0.0), then
    * sim = 1 - d / min(|s1|,|s2|) with d capped at min length (clamps to [0,1]).
    * Exact value everywhere — mirrors the DuckDB-oracle SQL bit for bit.
    */
  def levenshteinSim(s1: String, s2: String): Double = {
    val lo = math.min(s1.length, s2.length)
    val hi = math.max(s1.length, s2.length)
    if (hi == 0) return 1.0
    if (lo.toDouble / hi.toDouble <= 0.5) return 0.0
    val d = math.min(levenshtein(s1, s2), lo)
    1.0 - d.toDouble / lo.toDouble
  }

  /** Max-length-normalized variant — the hedge for SURVEY.md §8.2's (med)
    * uncertainty on Duke's normalization denominator: sim = 1 - d/max. Behind
    * registry key "levenshtein-max"; swap in config if upstream parity ever
    * demands it.
    */
  def levenshteinSimMax(s1: String, s2: String): Double = {
    val hi = math.max(s1.length, s2.length)
    if (hi == 0) return 1.0
    1.0 - levenshtein(s1, s2).toDouble / hi.toDouble
  }

  /** Banded variant for the pipeline hot path: identical result whenever
    * sim > 0.5; returns 0.0 (instead of the exact sub-0.5 value) when the band
    * proves sim <= 0.5 — replicating Duke's cutoff optimization
    * `[D comparators/Levenshtein.java#compare]` early-exit.
    */
  def levenshteinSimCutoff(s1: String, s2: String): Double = {
    val lo = math.min(s1.length, s2.length)
    val hi = math.max(s1.length, s2.length)
    if (hi == 0) return 1.0
    if (lo.toDouble / hi.toDouble <= 0.5) return 0.0
    val band = lo / 2 // d > band  =>  1 - d/lo < 0.5
    if (hi - lo > band) return 0.0
    var prev = Array.tabulate(s2.length + 1)(identity)
    var cur = new Array[Int](s2.length + 1)
    var i = 1
    while (i <= s1.length) {
      cur(0) = i
      var rowMin = cur(0)
      var j = 1
      while (j <= s2.length) {
        val cost = if (s1.charAt(i - 1) == s2.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        if (cur(j) < rowMin) rowMin = cur(j)
        j += 1
      }
      if (rowMin > band) return 0.0
      val t = prev; prev = cur; cur = t
      i += 1
    }
    val d = math.min(prev(s2.length), lo)
    val sim = 1.0 - d.toDouble / lo.toDouble
    if (sim <= 0.5) 0.0 else sim
  }

  /** Duke WeightedLevenshtein `[D comparators/WeightedLevenshtein.java]`:
    * char-class-weighted edit costs — edits touching a digit cost `digitWeight`
    * (default 2.0, digits carry more identity signal), others 1.0; normalized by
    * the weighted length of the shorter string.
    */
  def weightedLevenshteinSim(s1: String, s2: String, digitWeight: Double): Double = {
    def w(c: Char): Double = if (c >= '0' && c <= '9') digitWeight else 1.0
    if (s1.isEmpty && s2.isEmpty) return 1.0
    var prev = new Array[Double](s2.length + 1)
    var cur = new Array[Double](s2.length + 1)
    var j = 0
    var acc = 0.0
    while (j <= s2.length) {
      prev(j) = acc
      if (j < s2.length) acc += w(s2.charAt(j))
      j += 1
    }
    var i = 1
    while (i <= s1.length) {
      cur(0) = prev(0) + w(s1.charAt(i - 1))
      j = 1
      while (j <= s2.length) {
        val c1 = s1.charAt(i - 1); val c2 = s2.charAt(j - 1)
        val sub = if (c1 == c2) 0.0 else math.max(w(c1), w(c2))
        cur(j) = math.min(math.min(cur(j - 1) + w(c2), prev(j) + w(c1)), prev(j - 1) + sub)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    val d = prev(s2.length)
    val norm = math.min(s1.map(w).sum, s2.map(w).sum)
    if (norm == 0.0) return if (d == 0.0) 1.0 else 0.0
    math.max(0.0, 1.0 - d / norm)
  }

  // ---------------------------------------------------------------- q-grams & token sets

  /** Distinct q-gram set (Duke QGramComparator uses gram *sets* — SURVEY.md §8.2). */
  def qgrams(s: String, q: Int): Set[String] =
    if (s.length < q) Set.empty else (0 to s.length - q).map(i => s.substring(i, i + q)).toSet

  final val FormulaOverlap = 0
  final val FormulaDice = 1
  final val FormulaJaccard = 2

  /** Duke QGramComparator `[D comparators/QGramComparator.java]`: q-gram sets,
    * formula OVERLAP |A∩B|/min, DICE 2|A∩B|/(|A|+|B|) (default), JACCARD |A∩B|/|A∪B|.
    * Both strings shorter than q: exact-match fallback.
    */
  def qgramSim(s1: String, s2: String, q: Int, formula: Int): Double = {
    if (s1 == s2) return 1.0
    val a = qgrams(s1, q)
    val b = qgrams(s2, q)
    if (a.isEmpty || b.isEmpty) return 0.0
    setSim(a, b, formula)
  }

  def qgramDice(s1: String, s2: String): Double = qgramSim(s1, s2, 2, FormulaDice)

  /** Double-parameter overloads: codegen emits literal double args uniformly
    * (`graft.expr.SimExpr#doGenCode`), so every parameterized comparator needs a
    * (String, String, Double*) static entry point.
    */
  def qgramSimD(s1: String, s2: String, q: Double, formula: Double): Double =
    qgramSim(s1, s2, q.toInt, formula.toInt)
  def weightedLevenshteinSimD(s1: String, s2: String, digitWeight: Double): Double =
    weightedLevenshteinSim(s1, s2, digitWeight)
  def geoSimD(p1: String, p2: String, maxMeters: Double): Double =
    geoSim(p1, p2, maxMeters)

  private def setSim(a: Set[String], b: Set[String], formula: Int): Double = {
    val inter = a.count(b.contains).toDouble
    formula match {
      case FormulaOverlap => inter / math.min(a.size, b.size)
      case FormulaDice    => 2.0 * inter / (a.size + b.size)
      case FormulaJaccard => inter / (a.size + b.size - inter)
      case _              => throw new IllegalArgumentException(s"formula $formula")
    }
  }

  private def tokens(s: String): Set[String] = s.split("\\s+").filter(_.nonEmpty).toSet

  /** Duke DiceCoefficientComparator `[D comparators/DiceCoefficientComparator.java]`:
    * whitespace-token sets, 2|A∩B|/(|A|+|B|).
    */
  def diceToken(s1: String, s2: String): Double = {
    if (s1 == s2) return 1.0
    val a = tokens(s1); val b = tokens(s2)
    if (a.isEmpty || b.isEmpty) return 0.0
    setSim(a, b, FormulaDice)
  }

  /** Duke JaccardIndexComparator `[D comparators/JaccardIndexComparator.java]`. */
  def jaccardToken(s1: String, s2: String): Double = {
    if (s1 == s2) return 1.0
    val a = tokens(s1); val b = tokens(s2)
    if (a.isEmpty || b.isEmpty) return 0.0
    setSim(a, b, FormulaJaccard)
  }

  // ---------------------------------------------------------------- numeric / geo / LCS

  /** Duke NumericComparator `[D comparators/NumericComparator.java]`: parse both as
    * doubles; equal -> 1.0; both strictly positive -> min/max ratio; sign mismatch or
    * zero -> 0.0; unparseable -> 0.5 (no evidence either way).
    */
  def numericSim(s1: String, s2: String): Double = {
    val d1 = parseDouble(s1)
    val d2 = parseDouble(s2)
    if (d1.isNaN || d2.isNaN) return 0.5
    if (d1 == d2) return 1.0
    if (d1 <= 0.0 || d2 <= 0.0) return 0.0
    math.min(d1, d2) / math.max(d1, d2)
  }

  private def parseDouble(s: String): Double =
    try java.lang.Double.parseDouble(s.trim)
    catch { case _: Exception => Double.NaN }

  /** Duke GeopositionComparator `[D comparators/GeopositionComparator.java]`:
    * "lat,lon" haversine distance d; sim = max(0, 1 - d/maxMeters).
    */
  def geoSim(p1: String, p2: String, maxMeters: Double): Double = {
    val a = p1.split(","); val b = p2.split(",")
    if (a.length != 2 || b.length != 2) return 0.5
    val lat1 = parseDouble(a(0)); val lon1 = parseDouble(a(1))
    val lat2 = parseDouble(b(0)); val lon2 = parseDouble(b(1))
    if (lat1.isNaN || lon1.isNaN || lat2.isNaN || lon2.isNaN) return 0.5
    val r = 6371008.8
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val h = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    val d = 2 * r * math.asin(math.min(1.0, math.sqrt(h)))
    math.max(0.0, 1.0 - d / maxMeters)
  }

  /** Duke LongestCommonSubstring `[D comparators/LongestCommonSubstring.java]`:
    * repeatedly remove the longest common substring (>= minLen 2), accumulate removed
    * length; Dice-style 2*common/(|s1|+|s2|).
    */
  def lcsSim(s1: String, s2: String): Double = {
    if (s1 == s2) return 1.0
    if (s1.isEmpty || s2.isEmpty) return 0.0
    var a = s1; var b = s2
    var common = 0
    var continueLoop = true
    while (continueLoop) {
      val (len, ia, ib) = longestCommon(a, b)
      if (len < 2) continueLoop = false
      else {
        common += len
        a = a.substring(0, ia) + a.substring(ia + len)
        b = b.substring(0, ib) + b.substring(ib + len)
      }
    }
    2.0 * common / (s1.length + s2.length)
  }

  private def longestCommon(a: String, b: String): (Int, Int, Int) = {
    var best = 0; var bi = 0; var bj = 0
    val dp = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      var prevDiag = 0
      var j = 1
      while (j <= b.length) {
        val tmp = dp(j)
        if (a.charAt(i - 1) == b.charAt(j - 1)) {
          dp(j) = prevDiag + 1
          if (dp(j) > best) { best = dp(j); bi = i - dp(j); bj = j - dp(j) }
        } else dp(j) = 0
        prevDiag = tmp
        j += 1
      }
      i += 1
    }
    (best, bi, bj)
  }

  // ---------------------------------------------------------------- phonetic & person

  /** 1.0 iff Soundex codes equal — Duke SoundexComparator. */
  def soundexEq(s1: String, s2: String): Double =
    if (Phonetics.soundex(s1) == Phonetics.soundex(s2)) 1.0 else 0.0

  /** 1.0 iff Metaphone codes equal — Duke MetaphoneComparator. */
  def metaphoneEq(s1: String, s2: String): Double =
    if (Phonetics.metaphone(s1) == Phonetics.metaphone(s2)) 1.0 else 0.0

  /** 1.0 iff Norphone codes equal — Duke NorphoneComparator. */
  def norphoneEq(s1: String, s2: String): Double =
    if (Phonetics.norphone(s1) == Phonetics.norphone(s2)) 1.0 else 0.0

  /** Duke PersonNameComparator `[D comparators/PersonNameComparator.java]`:
    * name-aware — token-swap tolerance, initial-vs-full-name tolerance, per-token
    * Jaro-Winkler fallback.
    */
  def personNameSim(s1: String, s2: String): Double = {
    if (s1 == s2) return 1.0
    val t1 = s1.split("\\s+").filter(_.nonEmpty)
    val t2 = s2.split("\\s+").filter(_.nonEmpty)
    if (t1.isEmpty || t2.isEmpty) return 0.0
    if (t1.toSet == t2.toSet) return 0.95 // same tokens, different order
    // canonical orientation => symmetric under argument swap
    val (a, b) =
      if (t1.length < t2.length) (t1, t2)
      else if (t2.length < t1.length) (t2, t1)
      else if (s1 <= s2) (t1, t2)
      else (t2, t1)
    val used = new Array[Boolean](b.length)
    var total = 0.0
    var i = 0
    while (i < a.length) {
      var best = 0.0; var bestJ = -1
      var j = 0
      while (j < b.length) {
        if (!used(j)) {
          val s = tokenNameSim(a(i), b(j))
          if (s > best) { best = s; bestJ = j }
        }
        j += 1
      }
      if (bestJ >= 0) used(bestJ) = true
      total += best
      i += 1
    }
    val base = total / b.length // unmatched extra tokens dilute
    math.min(0.95, base) // only exact equality reaches 1.0
  }

  private def tokenNameSim(a: String, b: String): Double = {
    if (a == b) 1.0
    else if (a.length == 1 && b.nonEmpty && b.charAt(0) == a.charAt(0)) 0.9 // initial
    else if (b.length == 1 && a.nonEmpty && a.charAt(0) == b.charAt(0)) 0.9
    else jaroWinkler(a, b)
  }

  // ---------------------------------------------------------------- registry

  /** Comparator registry: short names + Duke class-name aliases (config parity,
    * SURVEY.md §1.2). Values: (s1, s2, params) => sim.
    */
  val registry: Map[String, (String, String, Array[Double]) => Double] = {
    val base: Map[String, (String, String, Array[Double]) => Double] = Map(
      "exact" -> ((a, b, _) => exact(a, b)),
      "jaro-winkler" -> ((a, b, _) => jaroWinkler(a, b)),
      "jaro-winkler-tokenized" -> ((a, b, _) => jaroWinklerTokenized(a, b)),
      "levenshtein" -> ((a, b, _) => levenshteinSim(a, b)),
      "levenshtein-max" -> ((a, b, _) => levenshteinSimMax(a, b)),
      "levenshtein-cutoff" -> ((a, b, _) => levenshteinSimCutoff(a, b)),
      "weighted-levenshtein" -> ((a, b, p) =>
        weightedLevenshteinSim(a, b, if (p.nonEmpty) p(0) else 2.0)),
      "qgram" -> ((a, b, p) =>
        qgramSim(a, b, if (p.nonEmpty) p(0).toInt else 2, if (p.length > 1) p(1).toInt else FormulaDice)),
      "dice" -> ((a, b, _) => diceToken(a, b)),
      "jaccard" -> ((a, b, _) => jaccardToken(a, b)),
      "numeric" -> ((a, b, _) => numericSim(a, b)),
      "geoposition" -> ((a, b, p) => geoSim(a, b, if (p.nonEmpty) p(0) else 1000.0)),
      "soundex" -> ((a, b, _) => soundexEq(a, b)),
      "metaphone" -> ((a, b, _) => metaphoneEq(a, b)),
      "norphone" -> ((a, b, _) => norphoneEq(a, b)),
      "person-name" -> ((a, b, _) => personNameSim(a, b)),
      "longest-common-substring" -> ((a, b, _) => lcsSim(a, b)))
    val dukeAliases = Map(
      "no.priv.garshol.duke.comparators.ExactComparator" -> "exact",
      "no.priv.garshol.duke.comparators.JaroWinkler" -> "jaro-winkler",
      "no.priv.garshol.duke.comparators.JaroWinklerTokenized" -> "jaro-winkler-tokenized",
      "no.priv.garshol.duke.comparators.Levenshtein" -> "levenshtein",
      "no.priv.garshol.duke.comparators.WeightedLevenshtein" -> "weighted-levenshtein",
      "no.priv.garshol.duke.comparators.QGramComparator" -> "qgram",
      "no.priv.garshol.duke.comparators.DiceCoefficientComparator" -> "dice",
      "no.priv.garshol.duke.comparators.JaccardIndexComparator" -> "jaccard",
      "no.priv.garshol.duke.comparators.NumericComparator" -> "numeric",
      "no.priv.garshol.duke.comparators.GeopositionComparator" -> "geoposition",
      "no.priv.garshol.duke.comparators.SoundexComparator" -> "soundex",
      "no.priv.garshol.duke.comparators.MetaphoneComparator" -> "metaphone",
      "no.priv.garshol.duke.comparators.NorphoneComparator" -> "norphone",
      "no.priv.garshol.duke.comparators.PersonNameComparator" -> "person-name",
      "no.priv.garshol.duke.comparators.LongestCommonSubstring" -> "longest-common-substring")
    base ++ dukeAliases.map { case (k, v) => k -> base(v) }
  }

  /** Dispatch entry point for the interpreted (non-codegen) expression path. */
  def dispatch(name: String, s1: String, s2: String, params: Array[Double]): Double =
    registry(name)(s1, s2, params)
}
