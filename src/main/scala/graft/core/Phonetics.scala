package graft.core

/** Phonetic encoders backing Duke's SoundexComparator / MetaphoneComparator /
  * NorphoneComparator (SURVEY.md §2.4 K10-K11). Public algorithms (Russell
  * Soundex 1918; Philips Metaphone 1990; Garshol Norphone) re-implemented from
  * their published descriptions.
  */
object Phonetics {

  /** American Soundex: first letter + 3 digits; H/W transparent between
    * same-coded consonants; vowels reset the run.
    */
  def soundex(s: String): String = {
    if (s == null) return null
    val up = s.toUpperCase.filter(c => c >= 'A' && c <= 'Z')
    if (up.isEmpty) return ""
    def code(c: Char): Int = c match {
      case 'B' | 'F' | 'P' | 'V'                         => 1
      case 'C' | 'G' | 'J' | 'K' | 'Q' | 'S' | 'X' | 'Z' => 2
      case 'D' | 'T'                                     => 3
      case 'L'                                           => 4
      case 'M' | 'N'                                     => 5
      case 'R'                                           => 6
      case _                                             => 0 // vowels + H W Y
    }
    val sb = new StringBuilder
    sb.append(up.charAt(0))
    var last = code(up.charAt(0))
    var i = 1
    while (i < up.length && sb.length < 4) {
      val c = up.charAt(i)
      val k = code(c)
      if (k > 0 && k != last) sb.append(('0' + k).toChar)
      if (c != 'H' && c != 'W') last = k // H/W do not break a run
      i += 1
    }
    while (sb.length < 4) sb.append('0')
    sb.toString
  }

  /** Classic Metaphone (Lawrence Philips, 1990), full-length code. Covers the
    * standard rules: silent letters, TH, CH/SH, C/G softening, X, PH, dropped
    * B after M, etc.
    */
  def metaphone(s: String): String = {
    if (s == null) return null
    val w = s.toUpperCase.filter(c => c >= 'A' && c <= 'Z')
    if (w.isEmpty) return ""
    val n = w.length
    def ch(i: Int): Char = if (i >= 0 && i < n) w.charAt(i) else 0.toChar
    def isVowel(c: Char): Boolean = "AEIOU".indexOf(c) >= 0
    val out = new StringBuilder
    var i = 0
    // initial-letter exceptions
    (ch(0), ch(1)) match {
      case ('A', 'E')                                     => i = 1 // AE- -> E
      case ('G', 'N') | ('K', 'N') | ('P', 'N') | ('W', 'R') => i = 1
      case ('X', _)                                       => out.append('S'); i = 1
      case ('W', 'H')                                     => out.append('W'); i = 2
      case _                                              =>
    }
    while (i < n && out.length < 32) {
      val c = ch(i)
      val prev = ch(i - 1)
      val next = ch(i + 1)
      // skip duplicate consonants except C
      if (c == prev && c != 'C') { i += 1 }
      else {
        c match {
          case 'A' | 'E' | 'I' | 'O' | 'U' =>
            if (i == 0) out.append(c)
          case 'B' =>
            if (!(i == n - 1 && prev == 'M')) out.append('B')
          case 'C' =>
            if (next == 'I' && ch(i + 2) == 'A') out.append('X')
            else if (next == 'H') { out.append(if (prev == 'S') 'K' else 'X'); i += 1 }
            else if (next == 'I' || next == 'E' || next == 'Y')
              { if (prev != 'S') out.append('S') }
            else out.append('K')
          case 'D' =>
            if (next == 'G' && "EIY".indexOf(ch(i + 2)) >= 0) { out.append('J'); i += 1 }
            else out.append('T')
          case 'G' =>
            if (next == 'H' && !isVowel(ch(i + 2))) { i += 1 } // silent GH
            else if (next == 'N') { /* silent before N */ }
            else if (next == 'I' || next == 'E' || next == 'Y') out.append('J')
            else out.append('K')
          case 'H' =>
            if (isVowel(prev) && !isVowel(next)) { /* silent */ }
            else if ("CSPTG".indexOf(prev) >= 0) { /* handled by digraphs */ }
            else out.append('H')
          case 'K' =>
            if (prev != 'C') out.append('K')
          case 'P' =>
            if (next == 'H') { out.append('F'); i += 1 } else out.append('P')
          case 'Q' => out.append('K')
          case 'S' =>
            if (next == 'H') { out.append('X'); i += 1 }
            else if (next == 'I' && (ch(i + 2) == 'O' || ch(i + 2) == 'A')) out.append('X')
            else out.append('S')
          case 'T' =>
            if (next == 'H') { out.append('0'); i += 1 } // theta
            else if (next == 'I' && (ch(i + 2) == 'O' || ch(i + 2) == 'A')) out.append('X')
            else out.append('T')
          case 'V' => out.append('F')
          case 'W' => if (isVowel(next)) out.append('W')
          case 'X' => out.append('K').append('S')
          case 'Y' => if (isVowel(next)) out.append('Y')
          case 'Z' => out.append('S')
          case 'F' | 'J' | 'L' | 'M' | 'N' | 'R' => out.append(c)
          case _ =>
        }
        i += 1
      }
    }
    out.toString
  }

  /** Norphone (Lars Marius Garshol's Norwegian phonetic key), core published
    * rules: Æ/Ø/Å folding, AA -> Å, silent H before J/V, CH/C -> K, SKJ/KJ/TJ
    * -> X-ish codes, GJ/HJ/LJ initial -> J, doubled letters collapsed.
    */
  def norphone(s: String): String = {
    if (s == null) return null
    var w = s.toUpperCase
      .replace("AA", "Å").replace("AE", "Æ").replace("OE", "Ø")
    w = w.filter(c => (c >= 'A' && c <= 'Z') || c == 'Å' || c == 'Æ' || c == 'Ø')
    if (w.isEmpty) return ""
    // digraph rules (longest first)
    w = w.replaceAll("^GJ", "J").replaceAll("^HJ", "J").replaceAll("^LJ", "J")
      .replaceAll("^SKJ", "X").replaceAll("^KJ", "X").replaceAll("^TJ", "X")
      .replaceAll("SKJ", "X")
      .replace("CH", "K").replace("CK", "K").replace("GH", "K")
      .replace("PH", "F").replace("TH", "T").replace("HG", "K")
      .replace("Æ", "E").replace("Ø", "O").replace("Å", "O")
      .replace("C", "K").replace("Q", "K").replace("W", "V")
      .replace("Z", "S").replace("X", "KS")
    // collapse doubles
    val sb = new StringBuilder
    var i = 0
    while (i < w.length) {
      if (i == 0 || w.charAt(i) != w.charAt(i - 1)) sb.append(w.charAt(i))
      i += 1
    }
    sb.toString
  }
}
