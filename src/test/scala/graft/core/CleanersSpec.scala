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

  test("resolve: parameterized compact specs (C8/C9 config surface)") {
    assert(Cleaners.resolve("regexp((\\d{4}))")("zip 0371 oslo") == "0371")
    assert(Cleaners.resolve("regexp((\\d{4}))")("no digits") == null)
    assert(Cleaners.resolve("regexp(([a-z]+)-([0-9]+),2)")("ab-17") == "17")
    // a pattern ending in ,digits must carry the explicit group
    assert(Cleaners.resolve("regexp((x,1),1)")("ax,1b") == "x,1")
    assert(Cleaners.resolve("mapping(st=street|rd=road)")("st") == "street")
    assert(Cleaners.resolve("mapping(st=street|rd=road)")("ave") == "ave")
    assert(Cleaners.resolve(
      "no.priv.garshol.duke.cleaners.RegexpCleaner((\\d+),1)")("a12") == "12")
    intercept[IllegalArgumentException](Cleaners.resolve("nonsense-cleaner"))
  }

  test("resolve: mapping-file reads from,to lines once") {
    val f = java.nio.file.Files.createTempFile("graft-map", ".csv")
    java.nio.file.Files.writeString(f, "gt,gate\nvn,veien\nst=street\n")
    try {
      val fn = Cleaners.resolve(s"mapping-file($f)")
      assert(fn("gt") == "gate" && fn("vn") == "veien" && fn("st") == "street")
      assert(fn("other") == "other")
      val duke = Cleaners.resolve(s"no.priv.garshol.duke.cleaners.MappingFileCleaner($f)")
      assert(duke("gt") == "gate")
    } finally java.nio.file.Files.delete(f)
  }

  test("norwegianAddress expands street abbreviations deterministically") {
    assert(Cleaners.norwegianAddress("Storgt. 12") == "storgate 12")
    assert(Cleaners.norwegianAddress("Storgata 12") == "storgate 12")
    assert(Cleaners.norwegianAddress("Kirkevn 3B") == "kirkeveien 3b")
    assert(Cleaners.norwegianAddress("Hovedvei 8") == "hovedveien 8")
    assert(Cleaners.norwegianAddress("Postboks 100") == "postboks 100")
    assert(Cleaners.norwegianAddress("PB 100") == "postboks 100")
    assert(Cleaners.clean("no.priv.garshol.duke.cleaners.NorwegianAddressCleaner",
      "Storgt. 12") == "storgate 12")
  }
}
