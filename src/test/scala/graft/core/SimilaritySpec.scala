package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Golden values from the SURVEY.md §8.2 formulas (FIXTURES.md §4) + algebraic
  * properties (SURVEY.md §5.2): the Duke-parity kernel tests.
  */
class SimilaritySpec extends AnyFunSuite {
  /** Seeded property loop (scalacheck-style, deterministic in the sandbox). */
  private def forAllPairs(seed: Long, n: Int, maxLen: Int, alpha: String)(
      check: (String, String) => Unit): Unit = {
    val rnd = new scala.util.Random(seed)
    def word(): String =
      Seq.fill(rnd.nextInt(maxLen + 1))(alpha(rnd.nextInt(alpha.length))).mkString
    (1 to n).foreach(_ => check(word(), word()))
  }

  private val eps = 1e-9

  private def approx(a: Double, b: Double, tol: Double = 1e-4): Unit =
    assert(math.abs(a - b) <= tol, s"$a vs $b")

  // ---- Jaro-Winkler golden vectors (standard published examples) ----
  test("jaro: MARTHA/MARHTA") { approx(Similarity.jaro("MARTHA", "MARHTA"), 0.944444) }
  test("jaro-winkler: MARTHA/MARHTA = 0.9611") {
    approx(Similarity.jaroWinkler("MARTHA", "MARHTA"), 0.961111)
  }
  test("jaro-winkler: DWAYNE/DUANE = 0.84") {
    approx(Similarity.jaroWinkler("DWAYNE", "DUANE"), 0.84)
  }
  test("jaro-winkler: DIXON/DICKSONX = 0.8133") {
    approx(Similarity.jaroWinkler("DIXON", "DICKSONX"), 0.813333)
  }
  test("jaro-winkler: identity, empty, disjoint") {
    approx(Similarity.jaroWinkler("abc", "abc"), 1.0)
    approx(Similarity.jaroWinkler("", ""), 1.0)
    approx(Similarity.jaroWinkler("abc", "xyz"), 0.0)
  }

  // ---- Levenshtein ----
  test("levenshtein distance kitten/sitting = 3") {
    assert(Similarity.levenshtein("kitten", "sitting") == 3)
  }
  test("levenshteinSim = 1 - d/min, kitten/sitting = 0.5") {
    approx(Similarity.levenshteinSim("kitten", "sitting"), 1.0 - 3.0 / 6.0, eps)
  }
  test("levenshteinSim length-ratio early exit") {
    assert(Similarity.levenshteinSim("ab", "abcdef") == 0.0) // 2/6 <= 0.5
    assert(Similarity.levenshteinSim("abc", "abcdef") == 0.0) // 3/6 <= 0.5 boundary
  }
  test("levenshteinSimCutoff agrees with exact sim whenever sim > 0.5") {
    forAllPairs(seed = 7, n = 500, maxLen = 8, alpha = "abcd") { (a, b) =>
      val exact = Similarity.levenshteinSim(a, b)
      val fast = Similarity.levenshteinSimCutoff(a, b)
      if (exact > 0.5) assert(math.abs(exact - fast) <= eps)
      else assert(fast <= 0.5)
    }
  }

  // ---- q-gram / token sets ----
  test("qgram dice nelson/neilsen") {
    // grams(nelson)={ne,el,ls,so,on}, grams(neilsen)={ne,ei,il,ls,se,en}, inter={ne,ls}
    approx(Similarity.qgramDice("nelson", "neilsen"), 2.0 * 2 / (5 + 6), eps)
  }
  test("qgram overlap & jaccard formulas") {
    approx(Similarity.qgramSim("nelson", "neilsen", 2, Similarity.FormulaOverlap), 2.0 / 5, eps)
    approx(Similarity.qgramSim("nelson", "neilsen", 2, Similarity.FormulaJaccard), 2.0 / 9, eps)
  }
  test("qgram short-string fallback") {
    assert(Similarity.qgramSim("a", "a", 2, 1) == 1.0)
    assert(Similarity.qgramSim("a", "b", 2, 1) == 0.0)
  }
  test("dice/jaccard token sets") {
    approx(Similarity.diceToken("main st north", "main st south"), 2.0 * 2 / 6, eps)
    approx(Similarity.jaccardToken("main st north", "main st south"), 2.0 / 4, eps)
  }

  // ---- numeric / geo / person / lcs ----
  test("numericSim ratio") {
    approx(Similarity.numericSim("10", "20"), 0.5, eps)
    approx(Similarity.numericSim("3.0", "3"), 1.0, eps)
    approx(Similarity.numericSim("abc", "3"), 0.5, eps)
    approx(Similarity.numericSim("-1", "3"), 0.0, eps)
  }
  test("geoSim: same point = 1, ~1.1km apart under max 2km") {
    approx(Similarity.geoSim("59.91,10.75", "59.91,10.75", 1000), 1.0, eps)
    val s = Similarity.geoSim("59.91,10.75", "59.92,10.75", 2000) // ~1112m
    assert(s > 0.4 && s < 0.5, s.toString)
  }
  test("personNameSim: swap and initials") {
    approx(Similarity.personNameSim("john smith", "john smith"), 1.0, eps)
    approx(Similarity.personNameSim("smith john", "john smith"), 0.95, eps)
    val ini = Similarity.personNameSim("j smith", "john smith")
    assert(ini > 0.9 && ini < 1.0, ini.toString)
  }
  test("lcsSim removes common substrings iteratively") {
    approx(Similarity.lcsSim("abcdef", "abcdef"), 1.0, eps)
    // "xxabyy" vs "zzabww": only "ab" common (len 2) -> 2*2/12
    approx(Similarity.lcsSim("xxabyy", "zzabww"), 4.0 / 12, eps)
  }

  // ---- phonetic comparators ----
  test("soundexEq / metaphoneEq on sound-alikes") {
    assert(Similarity.soundexEq("Robert", "Rupert") == 1.0)
    assert(Similarity.soundexEq("Robert", "Chris") == 0.0)
    assert(Similarity.metaphoneEq("Smith", "Smyth") == 1.0)
    assert(Similarity.metaphoneEq("Knight", "Night") == 1.0)
    assert(Similarity.metaphoneEq("Philip", "Filip") == 1.0)
  }

  // ---- algebraic properties (SURVEY.md §5.2) ----
  test("property: sim in [0,1], identity = 1, symmetry") {
    val fns: Seq[(String, (String, String) => Double)] = Seq(
      "jw" -> Similarity.jaroWinkler,
      "lev" -> Similarity.levenshteinSim,
      "qgram" -> Similarity.qgramDice,
      "dice" -> Similarity.diceToken,
      "jaccard" -> Similarity.jaccardToken,
      "lcs" -> Similarity.lcsSim,
      "person" -> Similarity.personNameSim)
    forAllPairs(seed = 11, n = 400, maxLen = 10, alpha = "abcdefg hij") { (a, b) =>
      fns.foreach { case (n, f) =>
        val s = f(a, b)
        assert(s >= 0.0 && s <= 1.0, s"$n($a,$b)=$s out of range")
        assert(math.abs(s - f(b, a)) < 1e-9, s"$n($a,$b) asymmetric")
        assert(math.abs(f(a, a) - 1.0) < 1e-9 || a.isEmpty, s"$n($a,$a) != 1")
      }
    }
  }
}
