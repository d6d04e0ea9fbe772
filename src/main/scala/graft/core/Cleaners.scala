package graft.core

import java.text.Normalizer

/** Pure-JVM value cleaners with the semantics of Duke's `no.priv.garshol.duke.cleaners.*`
  * (the normalization layer of the reference plugin's scoring path — see SURVEY.md §2.3;
  * reference anchors `[D cleaners package]`, consumed by
  * `[U EntityResolutionScript.java#ctor]`).
  *
  * Pure static functions so that (a) ScalaTest golden tests need no SparkSession and
  * (b) generated code (janino) can invoke them via static forwarders, keeping the
  * Catalyst expressions inside whole-stage codegen.
  */
object Cleaners {

  /** Duke TrimCleaner `[D cleaners/TrimCleaner.java]`. */
  def trim(s: String): String = if (s == null) null else s.trim

  /** Duke LowerCaseNormalizeCleaner `[D cleaners/LowerCaseNormalizeCleaner.java]`:
    * lower-case, fold accents to ASCII base letters, strip punctuation to spaces,
    * collapse internal whitespace, trim. Exact char classes pinned by golden tests
    * (SURVEY.md §2.3 C2).
    */
  def lowerCaseNormalize(s: String): String = {
    if (s == null) return null
    val folded = Normalizer
      .normalize(s, Normalizer.Form.NFD)
      .replaceAll("\\p{M}+", "")
    val sb = new java.lang.StringBuilder(folded.length)
    var prevSpace = true // leading spaces suppressed
    var i = 0
    while (i < folded.length) {
      val c = Character.toLowerCase(folded.charAt(i))
      if (Character.isLetterOrDigit(c)) {
        sb.append(c)
        prevSpace = false
      } else if (!prevSpace) { // any punct/space run -> single space
        sb.append(' ')
        prevSpace = true
      }
      i += 1
    }
    // drop trailing space
    var end = sb.length
    while (end > 0 && sb.charAt(end - 1) == ' ') end -= 1
    sb.substring(0, end)
  }

  /** Duke DigitsOnlyCleaner `[D cleaners/DigitsOnlyCleaner.java]`. */
  def digitsOnly(s: String): String = {
    if (s == null) return null
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Duke PhoneNumberCleaner `[D cleaners/PhoneNumberCleaner.java]`: normalize to
    * digit string; international "00" prefix and "+" country markers removed.
    */
  def phoneNumber(s: String): String = {
    if (s == null) return null
    var d = digitsOnly(s)
    if (d.startsWith("00")) d = d.substring(2)
    d
  }

  /** Duke FamilyCommaGivenCleaner `[D cleaners/FamilyCommaGivenCleaner.java]`:
    * "Doe, John" -> "john doe"; falls back to plain normalize when no comma.
    */
  def familyCommaGiven(s: String): String = {
    if (s == null) return null
    val ix = s.indexOf(',')
    if (ix < 0) lowerCaseNormalize(s)
    else lowerCaseNormalize(s.substring(ix + 1) + " " + s.substring(0, ix))
  }

  /** Duke RegexpCleaner `[D cleaners/RegexpCleaner.java]`: keep first group of the
    * first match; no match -> null (no evidence, property skipped — P3).
    */
  def regexpExtract(s: String, pattern: String, group: Int): String = {
    if (s == null) return null
    val m = java.util.regex.Pattern.compile(pattern).matcher(s)
    if (m.find()) m.group(group) else null
  }

  /** Duke MappingFileCleaner `[D cleaners/MappingFileCleaner.java]`: dictionary
    * replacement of whole values (applied after normalization by convention).
    */
  def mapping(s: String, dict: Map[String, String]): String = {
    if (s == null) return null
    dict.getOrElse(s, s)
  }

  /** Duke NorwegianCompanyNameCleaner-style suffix stripping on top of normalize
    * (`[D cleaners/NorwegianCompanyNameCleaner.java]`): legal-form tokens removed.
    */
  private val companySuffixes =
    Set("as", "asa", "ab", "ba", "ans", "da", "inc", "llc", "ltd", "gmbh", "sa", "co", "corp")
  def companyName(s: String): String = {
    if (s == null) return null
    val n = lowerCaseNormalize(s)
    n.split(' ').filterNot(companySuffixes.contains).mkString(" ")
  }

  /** Duke PersonNameCleaner `[D cleaners/PersonNameCleaner.java]`: normalize + known
    * nickname mapping (subset; extensible via `mapping`).
    */
  private val nicknames = Map(
    "bill" -> "william", "will" -> "william", "bob" -> "robert", "rob" -> "robert",
    "dick" -> "richard", "rick" -> "richard", "jim" -> "james", "jimmy" -> "james",
    "mike" -> "michael", "tom" -> "thomas", "tommy" -> "thomas", "tony" -> "anthony",
    "liz" -> "elizabeth", "beth" -> "elizabeth", "peggy" -> "margaret",
    "ted" -> "edward", "ed" -> "edward", "ned" -> "edward", "kate" -> "katherine",
    "katie" -> "katherine", "jack" -> "john", "johnny" -> "john", "joe" -> "joseph",
    "dave" -> "david", "dan" -> "daniel", "danny" -> "daniel", "steve" -> "stephen",
    "chris" -> "christopher", "chuck" -> "charles", "charlie" -> "charles",
    "andy" -> "andrew", "drew" -> "andrew", "sam" -> "samuel", "alex" -> "alexander")
  def personName(s: String): String = {
    if (s == null) return null
    lowerCaseNormalize(s).split(' ').map(t => nicknames.getOrElse(t, t)).mkString(" ")
  }

  /** Registry keyed by both short names and Duke class names (config parity with the
    * reference's query JSON — SURVEY.md §1.2). Parameterless cleaners only; regexp /
    * mapping cleaners are parameterized and constructed explicitly.
    */
  val registry: Map[String, String => String] = {
    val base: Map[String, String => String] = Map(
      "trim" -> trim,
      "lowercase-normalize" -> lowerCaseNormalize,
      "digits-only" -> digitsOnly,
      "phone-number" -> phoneNumber,
      "family-comma-given" -> familyCommaGiven,
      "company-name" -> companyName,
      "person-name" -> personName)
    val dukeAliases = Map(
      "no.priv.garshol.duke.cleaners.TrimCleaner" -> "trim",
      "no.priv.garshol.duke.cleaners.LowerCaseNormalizeCleaner" -> "lowercase-normalize",
      "no.priv.garshol.duke.cleaners.DigitsOnlyCleaner" -> "digits-only",
      "no.priv.garshol.duke.cleaners.PhoneNumberCleaner" -> "phone-number",
      "no.priv.garshol.duke.cleaners.FamilyCommaGivenCleaner" -> "family-comma-given",
      "no.priv.garshol.duke.cleaners.NorwegianCompanyNameCleaner" -> "company-name",
      "no.priv.garshol.duke.cleaners.PersonNameCleaner" -> "person-name")
    base ++ dukeAliases.map { case (k, v) => k -> base(v) }
  }

  /** Single-step clean by registry name (static entry point for codegen). */
  def clean(name: String, s: String): String = registry(name)(s)

  /** Ordered cleaner chain, as the reference applies to both sides
    * `[U EntityResolutionScript.java#ctor]`.
    */
  def chain(names: Seq[String], s: String): String =
    names.foldLeft(s)((acc, n) => if (acc == null) null else registry(n)(acc))
}
