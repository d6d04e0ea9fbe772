package graft

/** DuckDB SQL reconstructions of graft kernels for the driver's oracle compare
  * (SparkEntry.oracleSql). Each builder was validated in-session against the
  * corresponding JVM kernel over the full sf0.01 pair set (0 mismatches at
  * micro rounding) plus golden vectors; see SparkEntry's oracle-parity
  * conventions for why these are bit-reproducible.
  */
object DuckSql {

  /** American Soundex (graft.core.Phonetics.soundex): strip non-letters,
    * uppercase; H/W removed from positions ≥ 2 (transparent — they neither
    * emit nor reset a run); adjacent-dedup of char codes against the raw
    * previous (vowels reset runs via code 0); drop zeros; pad to 4.
    */
  def soundex(name: String): String = {
    def code(c: String) =
      s"(CASE WHEN $c IN ('B','F','P','V') THEN 1 " +
        s"WHEN $c IN ('C','G','J','K','Q','S','X','Z') THEN 2 " +
        s"WHEN $c IN ('D','T') THEN 3 WHEN $c = 'L' THEN 4 " +
        s"WHEN $c IN ('M','N') THEN 5 WHEN $c = 'R' THEN 6 ELSE 0 END)"
    s"""(SELECT CASE WHEN up = '' THEN '' ELSE
       |   substr(up,1,1) || rpad(array_to_string(list_transform(
       |     (list_filter(cs, (x,i) -> i > 1 AND x > 0 AND x <> cs[i-1]))[1:3],
       |     d -> CAST(d AS VARCHAR)), ''), 3, '0') END
       | FROM (SELECT up, CASE WHEN up = '' THEN [] ELSE
       |         [${code("substr(up,1,1)")}] ||
       |         list_transform(list_filter(list_transform(generate_series(2, length(up)), i -> substr(up, i, 1)),
       |           c -> c NOT IN ('H','W')), c -> ${code("c")}) END AS cs
       |       FROM (SELECT upper(regexp_replace($name, '[^A-Za-z]', '', 'g')) AS up)))""".stripMargin
  }

  /** Norphone (graft.core.Phonetics.norphone): the exact replace chain in the
    * kernel's order, then adjacent-double collapse.
    */
  def norphone(name: String): String = {
    var w = s"upper($name)"
    w = s"replace(replace(replace($w, 'AA', 'Å'), 'AE', 'Æ'), 'OE', 'Ø')"
    w = s"regexp_replace($w, '[^A-ZÅÆØ]', '', 'g')"
    for ((pat, rep) <- Seq("^GJ" -> "J", "^HJ" -> "J", "^LJ" -> "J",
        "^SKJ" -> "X", "^KJ" -> "X", "^TJ" -> "X"))
      w = s"regexp_replace($w, '$pat', '$rep')"
    for ((a, b) <- Seq("SKJ" -> "X", "CH" -> "K", "CK" -> "K", "GH" -> "K",
        "PH" -> "F", "TH" -> "T", "HG" -> "K", "Æ" -> "E", "Ø" -> "O", "Å" -> "O",
        "C" -> "K", "Q" -> "K", "W" -> "V", "Z" -> "S", "X" -> "KS"))
      w = s"replace($w, '$a', '$b')"
    s"""(SELECT array_to_string(list_filter(chs, (c,i) -> i = 1 OR c <> chs[i-1]), '')
       | FROM (SELECT list_transform(generate_series(1, length(w0)), i -> substr(w0, i, 1)) AS chs
       |       FROM (SELECT $w AS w0)))""".stripMargin
  }

  /** Whitespace-run token list, empties removed (kernel: split("\\s+")). */
  def wsTokens(c: String): String =
    s"list_filter(regexp_split_to_array($c, '\\s+'), t -> t <> '')"

  /** Unboosted Jaro-Winkler (graft's Duke-parity variant — no 0.7 boost
    * threshold): jw = j + l·0.1·(1−j) with common-prefix l ≤ 4. DuckDB's
    * jaro_similarity is bit-identical to graft's jaro on the tested corpus.
    */
  def jaroWinklerUnboosted(x: String, y: String): String = {
    val j = s"jaro_similarity($x, $y)"
    val l = s"(CASE WHEN length($x) < 1 OR length($y) < 1 OR substr($x,1,1) <> substr($y,1,1) THEN 0 " +
      s"WHEN length($x) < 2 OR length($y) < 2 OR substr($x,1,2) <> substr($y,1,2) THEN 1 " +
      s"WHEN length($x) < 3 OR length($y) < 3 OR substr($x,1,3) <> substr($y,1,3) THEN 2 " +
      s"WHEN length($x) < 4 OR length($y) < 4 OR substr($x,1,4) <> substr($y,1,4) THEN 3 " +
      s"ELSE 4 END)"
    s"($j + $l * 0.1 * (1 - $j))"
  }

  /** JaroWinklerTokenized over two token-list columns `ta`, `tb`: per-token
    * best unboosted JW, symmetric mean (graft.core.Similarity.jaroWinklerTokenized).
    */
  def jwTokenized(ta: String, tb: String): String = {
    val jw = jaroWinklerUnboosted("x", "y")
    s"(list_sum(list_transform($ta, x -> list_max(list_transform($tb, y -> $jw)))) / len($ta)" +
      s" + list_sum(list_transform($tb, x -> list_max(list_transform($ta, y -> $jw)))) / len($tb)) / 2.0"
  }

  /** Weighted-Levenshtein similarity (graft.core.Similarity
    * .weightedLevenshteinSim, digitWeight 2.0) as a nested list_reduce DP —
    * DuckDB's list_reduce requires accumulator type = element type, so DP rows
    * fold over index-singleton DOUBLE[] lists. Every intermediate is an
    * exact-integer-valued double (weights 1.0/2.0, sums, mins), so the single
    * final division is correctly rounded in both engines: bit-exact
    * (validated 0 mismatches over the full pair set in-session).
    */
  def weightedLevenshtein(x: String, y: String): String = {
    def w(c: String) = s"(CASE WHEN $c BETWEEN '0' AND '9' THEN 2.0 ELSE 1.0 END)"
    val xs = s"list_transform(generate_series(1, length($x)), i -> substr($x, i, 1))"
    val ys = s"list_transform(generate_series(1, length($y)), i -> substr($y, i, 1))"
    val row0 = s"list_reduce(list_prepend(CAST([0.0] AS DOUBLE[]), list_transform(ys0, c -> [${w("c")}])), " +
      "(acc, e) -> list_append(acc, acc[len(acc)] + e[1]))"
    val xc = "xs0[CAST(xi[1] AS INT)]"
    val yj = "ys0[CAST(jd[1] AS INT)]"
    val inner = s"list_reduce(list_prepend([prev[1] + ${w(xc)}], " +
      "list_transform(generate_series(1, len(ys0)), j -> [CAST(j AS DOUBLE)])), " +
      s"(cur, jd) -> list_append(cur, LEAST(" +
      s"cur[len(cur)] + ${w(yj)}, " +
      s"prev[CAST(jd[1] AS INT) + 1] + ${w(xc)}, " +
      s"prev[CAST(jd[1] AS INT)] + (CASE WHEN $xc = $yj THEN 0.0 ELSE GREATEST(${w(xc)}, ${w(yj)}) END))))"
    val dp = s"list_reduce(list_prepend(($row0), " +
      "list_transform(generate_series(1, len(xs0)), i -> [CAST(i AS DOUBLE)])), " +
      s"(prev, xi) -> ($inner))"
    s"""(SELECT CASE
       |   WHEN length(x0) = 0 AND length(y0) = 0 THEN 1.0
       |   WHEN norm = 0.0 THEN (CASE WHEN d = 0.0 THEN 1.0 ELSE 0.0 END)
       |   ELSE GREATEST(0.0, 1.0 - d / norm) END
       | FROM (SELECT x0, y0,
       |         (CASE WHEN len(xs0) = 0 THEN wy ELSE ($dp)[len(ys0) + 1] END) AS d,
       |         LEAST(wx, wy) AS norm
       |       FROM (SELECT x0, y0, xs0, ys0,
       |               coalesce(list_sum(list_transform(xs0, c -> ${w("c")})), 0.0) AS wx,
       |               coalesce(list_sum(list_transform(ys0, c -> ${w("c")})), 0.0) AS wy
       |             FROM (SELECT $x AS x0, $y AS y0, $xs AS xs0, $ys AS ys0))))""".stripMargin
  }

  /** Duke tokenNameSim (graft.core.Similarity.tokenNameSim): exact 1.0,
    * initial-vs-full 0.9 (either side), else unboosted Jaro-Winkler.
    */
  def tokenNameSim(x: String, y: String): String =
    s"(CASE WHEN $x = $y THEN 1.0 " +
      s"WHEN length($x) = 1 AND length($y) >= 1 AND substr($y,1,1) = substr($x,1,1) THEN 0.9 " +
      s"WHEN length($y) = 1 AND length($x) >= 1 AND substr($x,1,1) = substr($y,1,1) THEN 0.9 " +
      s"ELSE ${jaroWinklerUnboosted(x, y)} END)"

  /** PersonName similarity for names of EXACTLY two distinct single-space
    * tokens each (graft.core.Similarity.personNameSim restricted to the 2×2
    * shape): equal -> 1.0; equal token sets -> 0.95; else canonical
    * orientation (lexicographic — equal token counts) and the kernel's greedy
    * assignment (a1 takes the strictly-best of b1/b2, first-scanned wins
    * ties, nothing when both are 0; a2 takes the best unused), capped at
    * 0.95. Flat CTE pipeline — DuckDB 1.0 mis-binds deep correlated scalar
    * subqueries, so `ctes`+`result` slot into a WITH chain. Validated
    * bit-exact over the full pair set in-session.
    */
  def personName2x2Ctes(naExpr: String, nbExpr: String, from: String): String =
    s"""base AS (
       |  SELECT *, $naExpr AS na, $nbExpr AS nb $from),
       |tok AS (
       |  SELECT *,
       |    string_split(CASE WHEN na <= nb THEN na ELSE nb END, ' ')[1] AS a1,
       |    string_split(CASE WHEN na <= nb THEN na ELSE nb END, ' ')[2] AS a2,
       |    string_split(CASE WHEN na <= nb THEN nb ELSE na END, ' ')[1] AS b1,
       |    string_split(CASE WHEN na <= nb THEN nb ELSE na END, ' ')[2] AS b2
       |  FROM base),
       |sims AS (SELECT *, ${tokenNameSim("a1", "b1")} AS s11,
       |                 ${tokenNameSim("a1", "b2")} AS s12 FROM tok),
       |greedy AS (
       |  SELECT *,
       |    CASE WHEN s12 > s11 THEN s12 WHEN s11 > 0 THEN s11 ELSE 0.0 END AS sA1,
       |    CASE WHEN s12 > s11 THEN ${tokenNameSim("a2", "b1")}
       |         WHEN s11 > 0 THEN ${tokenNameSim("a2", "b2")}
       |         ELSE GREATEST(${tokenNameSim("a2", "b1")}, ${tokenNameSim("a2", "b2")},
       |                       CAST(0.0 AS DOUBLE)) END AS sA2
       |  FROM sims)""".stripMargin

  val personName2x2Result: String =
    """CASE WHEN na = nb THEN 1.0
      |     WHEN (a1 = b1 AND a2 = b2) OR (a1 = b2 AND a2 = b1) THEN 0.95
      |     ELSE LEAST(0.95, (sA1 + sA2) / 2.0) END""".stripMargin

  private val VOW = "('A','E','I','O','U')"

  /** One FSM step's emission, over prepared columns `cur`/`prv`/`nxt`/`nx2`
    * (current char and its neighbors), `i` (1-based cursor), `n` (word
    * length). Mirrors graft.core.Phonetics.metaphone's match arm-for-arm.
    */
  private val metaphoneEmit: String = s"""CASE
    WHEN cur = prv AND cur <> 'C' THEN ''
    WHEN cur IN $VOW THEN (CASE WHEN i = 1 THEN cur ELSE '' END)
    WHEN cur = 'B' THEN (CASE WHEN i = n AND prv = 'M' THEN '' ELSE 'B' END)
    WHEN cur = 'C' THEN (CASE
       WHEN nxt = 'I' AND nx2 = 'A' THEN 'X'
       WHEN nxt = 'H' THEN (CASE WHEN prv = 'S' THEN 'K' ELSE 'X' END)
       WHEN nxt IN ('I','E','Y') THEN (CASE WHEN prv = 'S' THEN '' ELSE 'S' END)
       ELSE 'K' END)
    WHEN cur = 'D' THEN (CASE WHEN nxt = 'G' AND nx2 IN ('E','I','Y') THEN 'J' ELSE 'T' END)
    WHEN cur = 'G' THEN (CASE
       WHEN nxt = 'H' AND nx2 NOT IN $VOW THEN ''
       WHEN nxt = 'N' THEN ''
       WHEN nxt IN ('I','E','Y') THEN 'J'
       ELSE 'K' END)
    WHEN cur = 'H' THEN (CASE
       WHEN prv IN $VOW AND nxt NOT IN $VOW THEN ''
       WHEN prv IN ('C','S','P','T','G') THEN ''
       ELSE 'H' END)
    WHEN cur = 'K' THEN (CASE WHEN prv = 'C' THEN '' ELSE 'K' END)
    WHEN cur = 'P' THEN (CASE WHEN nxt = 'H' THEN 'F' ELSE 'P' END)
    WHEN cur = 'Q' THEN 'K'
    WHEN cur = 'S' THEN (CASE
       WHEN nxt = 'H' THEN 'X'
       WHEN nxt = 'I' AND nx2 IN ('O','A') THEN 'X'
       ELSE 'S' END)
    WHEN cur = 'T' THEN (CASE
       WHEN nxt = 'H' THEN '0'
       WHEN nxt = 'I' AND nx2 IN ('O','A') THEN 'X'
       ELSE 'T' END)
    WHEN cur = 'V' THEN 'F'
    WHEN cur = 'W' THEN (CASE WHEN nxt IN $VOW THEN 'W' ELSE '' END)
    WHEN cur = 'X' THEN 'KS'
    WHEN cur = 'Y' THEN (CASE WHEN nxt IN $VOW THEN 'Y' ELSE '' END)
    WHEN cur = 'Z' THEN 'S'
    WHEN cur IN ('F','J','L','M','N','R') THEN cur
    ELSE '' END"""

  /** One FSM step's cursor advance: 2 for consumed digraphs (CH, DG+EIY,
    * silent GH, PH, SH, TH), else 1 — the kernel's extra `i += 1` sites.
    */
  private val metaphoneAdv: String = s"""CASE
    WHEN cur = prv AND cur <> 'C' THEN 1
    WHEN cur = 'C' AND nxt = 'H' AND NOT (nxt = 'I' AND nx2 = 'A') THEN 2
    WHEN cur = 'D' AND nxt = 'G' AND nx2 IN ('E','I','Y') THEN 2
    WHEN cur = 'G' AND nxt = 'H' AND nx2 NOT IN $VOW THEN 2
    WHEN cur = 'P' AND nxt = 'H' THEN 2
    WHEN cur = 'S' AND nxt = 'H' THEN 2
    WHEN cur = 'T' AND nxt = 'H' THEN 2
    ELSE 1 END"""

  /** Classic Metaphone (graft.core.Phonetics.metaphone) as a FLAT unrolled
    * CTE chain — the FSM's while-loop becomes `steps` chained no-op-when-done
    * SELECTs carrying (cursor, emitted-code) state, sidestepping DuckDB 1.0's
    * recursive-CTE segfault entirely. Each step advances the cursor ≥ 1, so
    * `steps` ≥ the letter count of the longest input word makes the unroll
    * exact (30 covers this repo's 18-char fixture names with headroom; the
    * chain no-ops once the cursor passes the end). A word longer than
    * `steps` letters raises DuckDB `error()` in mp0 — the oracle fails
    * loudly instead of silently truncating the code. Validated bit-exact
    * against the JVM kernel over a 7 086-word fuzz vocabulary (random
    * letters, digraph-heavy shapes, non-letter noise) in-session: 0
    * mismatches.
    *
    * @param wordsSql a relation expression with one VARCHAR column `word`
    * @return (CTE chunk for a WITH chain, final relation name) — the final
    *         relation has columns (word, code)
    */
  def metaphoneCtes(wordsSql: String, steps: Int = 30): (String, String) = {
    val pre = s"""mp0 AS (
      |  SELECT word, w, length(w) AS n,
      |    CASE WHEN substr(w,1,1)='W' AND substr(w,2,1)='H' THEN 3
      |         WHEN (substr(w,1,1)='A' AND substr(w,2,1)='E')
      |           OR (substr(w,1,1) IN ('G','K','P') AND substr(w,2,1)='N')
      |           OR (substr(w,1,1)='W' AND substr(w,2,1)='R')
      |           OR substr(w,1,1)='X' THEN 2
      |         ELSE 1 END AS i,
      |    CASE WHEN substr(w,1,1)='X' THEN 'S'
      |         WHEN substr(w,1,1)='W' AND substr(w,2,1)='H' THEN 'W'
      |         ELSE '' END AS o
      |  FROM (SELECT word, regexp_replace(upper(word), '[^A-Z]', '', 'g') AS w
      |        FROM $wordsSql)
      |  WHERE CASE WHEN length(w) > $steps
      |             THEN error('metaphoneCtes: word exceeds unroll bound (steps=$steps)')
      |             ELSE true END)""".stripMargin
    val chain = (1 to steps).map { k =>
      s"""mp$k AS (
        |  SELECT word, w, n,
        |    CASE WHEN act THEN i + ($metaphoneAdv) ELSE i END AS i,
        |    CASE WHEN act THEN o || ($metaphoneEmit) ELSE o END AS o
        |  FROM (
        |    SELECT word, w, n, i, o,
        |      (i <= n AND length(o) < 32) AS act,
        |      substr(w, i, 1) AS cur,
        |      CASE WHEN i > 1 THEN substr(w, i-1, 1) ELSE '' END AS prv,
        |      substr(w, i+1, 1) AS nxt,
        |      substr(w, i+2, 1) AS nx2
        |    FROM mp${k - 1}))""".stripMargin
    }.mkString(",\n")
    val fin = s"mpcodes AS (SELECT word, o AS code FROM mp$steps)"
    (s"$pre,\n$chain,\n$fin", "mpcodes")
  }

  /** Duke LongestCommonSubstring similarity (graft.core.Similarity.lcsSim —
    * iterated REMOVAL of the longest common substring, Dice over the summed
    * removed length) as a flat unrolled CTE chain: each step finds the best
    * remaining common substring via a LATERAL all-substrings probe (max
    * length, then the DP's scan-order tie-break: min end-in-a, then first
    * occurrence in b) and cuts it from both strings. Each removal takes ≥ 2
    * chars from each side, so `steps` ≥ ⌊min(len)/2⌋ is exact (10 covers the
    * 18-char fixture names; exhausted rows no-op). The substring-enumeration
    * bounds are CONSTANT series (1..maxLen) filtered by the live lengths —
    * DuckDB's generate_series cannot take lateral parameters. Inputs
    * exceeding either bound raise DuckDB `error()` in lcs0 (loud oracle
    * failure, never a silently wrong similarity). Validated
    * bit-exact against the JVM kernel over the full sf0.01 pair set
    * in-session: 0 mismatches.
    *
    * @param keys    columns carried through the chain (join keys + any
    *                passthroughs)
    * @param aExpr   left string expression (evaluated once, in `fromSql`)
    * @param bExpr   right string expression
    * @param fromSql the `FROM ...` clause producing the pair rows
    * @return (CTE chunk, final relation name, total-common column name) —
    *         similarity = 2.0 * common / tot, with `tot` also in the final
    *         relation
    */
  def lcsRemovalCtes(
      keys: Seq[String],
      aExpr: String,
      bExpr: String,
      fromSql: String,
      steps: Int = 10,
      maxLen: Int = 30): (String, String, String) = {
    val ks = keys.mkString(", ")
    // Runtime guard against silent under-counting if the fixture ever grows
    // past the unroll bounds: the probe enumerates substrings of `a` at
    // start/length <= maxLen, and exactness needs steps >= floor(min(len)/2)
    // removals (each removal takes >= 2 chars from BOTH sides). Out-of-bound
    // inputs raise a DuckDB error() — a loud oracle failure, never a wrong
    // similarity.
    val pre = s"""lcs0 AS (
      |  SELECT $ks, a0, b0, length(a0) + length(b0) AS tot, 0 AS c0
      |  FROM (SELECT $ks, $aExpr AS a0, $bExpr AS b0 $fromSql)
      |  WHERE CASE WHEN length(a0) > $maxLen
      |               OR least(length(a0), length(b0)) > ${2 * steps + 1}
      |             THEN error('lcsRemovalCtes: input exceeds unroll bounds (maxLen=$maxLen, steps=$steps)')
      |             ELSE true END)""".stripMargin
    val chain = (1 to steps).map { k =>
      val (a, b, c) = (s"a${k - 1}", s"b${k - 1}", s"c${k - 1}")
      s"""lcs$k AS (
        |  SELECT $ks, tot,
        |    CASE WHEN t.L IS NULL THEN $a ELSE substr($a,1,t.ia-1) || substr($a, t.ia+t.L) END AS a$k,
        |    CASE WHEN t.L IS NULL THEN $b ELSE substr($b,1,t.ib-1) || substr($b, t.ib+t.L) END AS b$k,
        |    $c + coalesce(t.L, 0) AS c$k
        |  FROM lcs${k - 1} LEFT JOIN LATERAL (
        |    SELECT g2.L AS L, g1.ia AS ia, strpos($b, substr($a, g1.ia, g2.L)) AS ib
        |    FROM generate_series(1, $maxLen) g1(ia), generate_series(2, $maxLen) g2(L)
        |    WHERE g1.ia + g2.L - 1 <= length($a)
        |      AND strpos($b, substr($a, g1.ia, g2.L)) > 0
        |    ORDER BY g2.L DESC, g1.ia ASC LIMIT 1
        |  ) t ON true)""".stripMargin
    }.mkString(",\n")
    (s"$pre,\n$chain", s"lcs$steps", s"c$steps")
  }

  /** Haversine similarity in the kernel's exact operation order
    * (graft.core.Similarity.geoSim): Java toRadians is x/180·π, distance
    * 2·R·asin(min(1,√h)), sim = max(0, 1 − d/maxMeters).
    */
  def haversineSim(lat1: String, lon1: String, lat2: String, lon2: String,
      maxMeters: Double): String = {
    def rad(x: String) = s"(($x) / 180.0 * pi())"
    val h = s"pow(sin(${rad(s"$lat2 - $lat1")} / 2), 2) + " +
      s"cos(${rad(lat1)}) * cos(${rad(lat2)}) * pow(sin(${rad(s"$lon2 - $lon1")} / 2), 2)"
    val d = s"2 * 6371008.8 * asin(LEAST(1.0, sqrt($h)))"
    s"GREATEST(0.0, 1.0 - ($d) / $maxMeters)"
  }
}
