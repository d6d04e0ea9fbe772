package graft.core

/** Tight-loop kernels behind the text-dedup expressions (`rolling_fp`,
  * `shingle_fps`). Each reproduces its declarative higher-order-function
  * twin in TrainingOps BIT-FOR-BIT (parity-tested in TextKernelsSpec and by
  * the unchanged DuckDB oracles): the HOF form materializes a per-character
  * `substring` object through interpreted lambda evaluation — ~10-50× slower
  * than one char loop — which made shingle fingerprinting the dominant cost
  * of the LSH/SimHash dedup queries.
  */
object TextKernels {

  final val P = 1000000007L

  /** (acc*31 + codepoint) % P over the string's codepoints; empty -> 0.
    * Twin of TrainingOps.fpSqlSpark / fpSqlDuck (Spark `length`/`substring`/
    * `ascii` operate on codepoints, hence codePointAt stepping).
    */
  def rollingFp(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** Distinct rolling-hash fingerprints of the word-k-shingles, first-seen
    * order (array_distinct semantics). Twin of TrainingOps.shingleFps:
    * tokens = split(text, ' ') minus empties; < k tokens -> the raw text is
    * the single shingle.
    */
  def tokenShingleFps(text: String, k: Int): Array[Long] = {
    val toks = text.split(" ", -1).filter(_.nonEmpty)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (toks.length < k) {
      seen.add(rollingFp(text))
    } else {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= toks.length - k) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(rollingFp(sb.toString))
        i += 1
      }
    }
    val out = new Array[Long](seen.size)
    var j = 0
    val it = seen.iterator()
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  /** 64-bit SimHash over fingerprint array -> Array(lo, hi) 32-bit halves.
    * Twin of TrainingOps.simhashBitSpark summed per bit: bit b's ±1 hash is
    * 2·(((2b+1)·f + 7919·b + 13) % P % 2) − 1; bit set when the sum over fps
    * is > 0. One O(64·n) loop instead of 64 interpreted array aggregates.
    */
  def simhash64(fps: Array[Long]): Array[Long] = {
    val counts = new Array[Int](64)
    var i = 0
    while (i < fps.length) {
      val f = fps(i)
      var b = 0
      while (b < 64) {
        val h = ((2L * b + 1) * f + (7919L * b + 13)) % P
        counts(b) += (if ((h % 2) == 1) 1 else -1)
        b += 1
      }
      i += 1
    }
    var lo = 0L
    var hi = 0L
    var b = 0
    while (b < 32) { if (counts(b) > 0) lo |= (1L << b); b += 1 }
    while (b < 64) { if (counts(b) > 0) hi |= (1L << (b - 32)); b += 1 }
    Array(lo, hi)
  }
}
