package graft.core

/** Embedding-vector kernels (similarity-search hot path). Each mirrors a
  * declarative higher-order-function twin in `TrainingOps` BIT-FOR-BIT —
  * same accumulation order, same per-element double casts — so swapping the
  * codegen expression for the interpreted HOF changes no oracle output
  * (VecKernelsSpec parity). The HOF forms interpret a lambda per element and
  * box every product; these are tight primitive loops.
  */
object VecKernels {

  /** Σ (double)a[i] · (double)b[i], accumulated in index order from 0.0 —
    * the twin of `TrainingOps.dotSpark` (aggregate over zip_with). Vectors
    * are same-dimension by construction; the shorter length bounds the loop.
    */
  def dot(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  /** sqrt(dot(v, v)) — the twin of `TrainingOps.normSpark`. */
  def norm(v: Array[Float]): Double = math.sqrt(dot(v, v))

  /** Sign-LSH bucket for band `band` with `planesPerBand` deterministic
    * integer hyperplanes h_j[k] = ((k·31 + j·17) % 7) − 3 (k 1-based, global
    * plane j = band·planesPerBand + jj) — the twin of
    * `TrainingOps.lshBandSpark`; `band = 0` reproduces `lshBucketSpark`.
    */
  def signLshBucket(v: Array[Float], band: Int, planesPerBand: Int): Long = {
    var bucket = 0L
    var jj = 0
    while (jj < planesPerBand) {
      val j = band * planesPerBand + jj
      var acc = 0.0
      var k = 1
      while (k <= v.length) {
        acc += v(k - 1).toDouble * (((k * 31 + j * 17) % 7) - 3).toDouble
        k += 1
      }
      if (acc > 0) bucket |= (1L << jj)
      jj += 1
    }
    bucket
  }
}
