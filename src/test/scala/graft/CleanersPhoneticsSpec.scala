package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Cleaners, Phonetics}

/** Golden + idempotence tests for the cleaner layer (SURVEY.md §2.3) and the
  * phonetic encoders (§2.4 K10-K11).
  */
class CleanersPhoneticsSpec extends AnyFunSuite {

  // ------------------------------------------------------------ cleaners

  test("trim / digits-only / phone-number golden") {
    assert(Cleaners.trim("  a b  ") === "a b")
    assert(Cleaners.digitsOnly("+1 (555) 123-4567") === "15551234567")
    assert(Cleaners.phoneNumber("0047 22 33 44 55") === "4722334455")
    assert(Cleaners.phoneNumber("(555) 123-4567") === "5551234567")
    assert(Cleaners.trim(null) === null)
  }

  test("lowercase-normalize: case, accents, punctuation, whitespace collapse") {
    assert(Cleaners.lowerCaseNormalize("  Élodie  DuPont-Smith!! ") === "elodie dupont smith")
    assert(Cleaners.lowerCaseNormalize("O'Brien, JR.") === "o brien jr")
    assert(Cleaners.lowerCaseNormalize("Ångström µ") === "angstrom µ")
    assert(Cleaners.lowerCaseNormalize("a\t\nb") === "a b")
    assert(Cleaners.lowerCaseNormalize("") === "")
  }

  test("family-comma-given / company-name / person-name golden") {
    assert(Cleaners.familyCommaGiven("Doe, John") === "john doe")
    assert(Cleaners.familyCommaGiven("John Doe") === "john doe")
    assert(Cleaners.companyName("Acme Widgets AS") === "acme widgets")
    assert(Cleaners.companyName("ACME, Inc.") === "acme")
    assert(Cleaners.personName("Bill Smith") === "william smith")
    assert(Cleaners.personName("Liz O'Neil") === "elizabeth o neil")
  }

  test("regexp / mapping cleaners") {
    assert(Cleaners.regexpExtract("zip 12345-678", "(\\d{5})", 1) === "12345")
    assert(Cleaners.regexpExtract("no digits", "(\\d{5})", 1) === null) // P3: no evidence
    assert(Cleaners.mapping("ny", Map("ny" -> "new york")) === "new york")
    assert(Cleaners.mapping("la", Map("ny" -> "new york")) === "la")
  }

  test("cleaners are idempotent (SURVEY.md §5.2 #2)") {
    val inputs = Seq("  Élodie  DuPont-Smith!! ", "Doe, John", "ACME AS", "Bill Smith",
      "+1 (555) 123-4567", "", "   ", "ÅÆØåæø", "a1b2c3")
    for ((name, fn) <- Cleaners.registry if !name.startsWith("no.priv"); in <- inputs) {
      val once = fn(in)
      assert(fn(once) === once, s"$name not idempotent on '$in': '$once' -> '${fn(once)}'")
    }
  }

  test("chain applies in order; duke class names alias (config parity)") {
    assert(Cleaners.chain(Seq("trim", "lowercase-normalize"), " A  B ") === "a b")
    assert(Cleaners.chain(
      Seq("no.priv.garshol.duke.cleaners.TrimCleaner",
        "no.priv.garshol.duke.cleaners.LowerCaseNormalizeCleaner"), " A  B ") === "a b")
    assert(Cleaners.chain(Nil, " x ") === " x ")
    assert(Cleaners.chain(Seq("trim"), null) === null)
  }

  // ------------------------------------------------------------ phonetics

  test("soundex golden vectors (Russell/NARA rules incl. H/W transparency)") {
    assert(Phonetics.soundex("Robert") === "R163")
    assert(Phonetics.soundex("Rupert") === "R163")
    assert(Phonetics.soundex("Ashcraft") === "A261")
    assert(Phonetics.soundex("Ashcroft") === "A261")
    assert(Phonetics.soundex("Tymczak") === "T522")
    assert(Phonetics.soundex("Pfister") === "P236")
    assert(Phonetics.soundex("Honeyman") === "H555")
    assert(Phonetics.soundex("Washington") === "W252")
    assert(Phonetics.soundex("lee") === "L000")
    assert(Phonetics.soundex("") === "")
    assert(Phonetics.soundex("123") === "")
  }

  test("metaphone: equality classes and shape") {
    assert(Phonetics.metaphone("Smith") === Phonetics.metaphone("Smyth"))
    assert(Phonetics.metaphone("Knight").startsWith("N")) // silent K
    assert(Phonetics.metaphone("Philip") === Phonetics.metaphone("Filip"))
    assert(Phonetics.metaphone("Xavier").startsWith("S"))
    assert(Phonetics.metaphone("Wright").startsWith("R")) // WR- -> R
    assert(Phonetics.metaphone("") === "")
  }

  test("norphone: Norwegian folding rules") {
    assert(Phonetics.norphone("Kristiansen") === Phonetics.norphone("Christiansen"))
    assert(Phonetics.norphone("Carlsen") === Phonetics.norphone("Karlsen"))
    assert(Phonetics.norphone("Aase") === Phonetics.norphone("Åse"))
    assert(Phonetics.norphone("Wold") === Phonetics.norphone("Vold"))
    assert(Phonetics.norphone("Gjertsen").startsWith("J"))
  }

  test("phonetic codes are deterministic + stable on ascii-noise input") {
    val r = new scala.util.Random(3)
    for (_ <- 1 to 500) {
      val w = (0 until r.nextInt(12)).map(_ => ('a' + r.nextInt(26)).toChar).mkString
      assert(Phonetics.soundex(w) === Phonetics.soundex(w))
      assert(Phonetics.metaphone(w) === Phonetics.metaphone(w))
      assert(Phonetics.norphone(w) === Phonetics.norphone(w))
      assert(Phonetics.soundex(w.toUpperCase) === Phonetics.soundex(w))
    }
  }
}
