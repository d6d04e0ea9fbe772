package graft.core

import org.scalatest.funsuite.AnyFunSuite

class CleanersSpec extends AnyFunSuite {

  test("trim") { assert(Cleaners.trim("  a b  ") == "a b") }

  test("lowerCaseNormalize: case, whitespace, accents, punctuation") {
    assert(Cleaners.lowerCaseNormalize("  J.  Random   HACKER ") == "j random hacker")
    assert(Cleaners.lowerCaseNormalize("Émile Zola-Brontë") == "emile zola bronte")
    assert(Cleaners.lowerCaseNormalize("ACME, Inc.") == "acme inc")
    assert(Cleaners.lowerCaseNormalize("") == "")
    assert(Cleaners.lowerCaseNormalize("!!!") == "")
  }

  test("lowerCaseNormalize idempotent (seeded property)") {
    val rnd = new scala.util.Random(3)
    val alpha = "aB cD-É.,*9"
    (1 to 300).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(15))(alpha(rnd.nextInt(alpha.length))).mkString
      val once = Cleaners.lowerCaseNormalize(s)
      assert(Cleaners.lowerCaseNormalize(once) == once, s"not idempotent on '$s'")
    }
  }

  test("digitsOnly / phoneNumber") {
    assert(Cleaners.digitsOnly("+47 (55) 12-34") == "47551234")
    assert(Cleaners.phoneNumber("0047 55 12 34") == "47551234")
    assert(Cleaners.phoneNumber("555-1234") == "5551234")
  }

  test("familyCommaGiven") {
    assert(Cleaners.familyCommaGiven("Doe, John") == "john doe")
    assert(Cleaners.familyCommaGiven("John Doe") == "john doe")
  }

  test("companyName strips legal suffixes") {
    assert(Cleaners.companyName("Acme AS") == "acme")
    assert(Cleaners.companyName("Acme Ltd.") == "acme")
  }

  test("personName maps nicknames after normalize") {
    assert(Cleaners.personName("Bill  Smith") == "william smith")
    assert(Cleaners.personName("JIMMY o'neil") == "james o neil")
  }

  test("regexpExtract + mapping") {
    assert(Cleaners.regexpExtract("zip 0371 oslo", "(\\d{4})", 1) == "0371")
    assert(Cleaners.regexpExtract("no digits", "(\\d{4})", 1) == null)
    assert(Cleaners.mapping("st", Map("st" -> "street")) == "street")
  }

  test("chain applies in order; Duke class-name aliases resolve") {
    assert(Cleaners.chain(Seq("trim", "lowercase-normalize"), " A  B ") == "a b")
    assert(Cleaners.clean("no.priv.garshol.duke.cleaners.TrimCleaner", " x ") == "x")
  }
}
