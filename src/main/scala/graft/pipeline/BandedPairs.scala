package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe candidate generation for banded near-dup schemes (MinHash-LSH
  * bands, SimHash sub-keys, sign-LSH buckets — SURVEY.md §2 LLM-pipeline ops).
  *
  * The naive shape — `bands.join(bands, (band_ix, band_val))` — is quadratic
  * in the hottest bucket: a dup-heavy crawl corpus (10⁶ copies of one
  * boilerplate page sharing every band) turns one key cell into 10¹²
  * candidate rows. This module applies the same discipline as
  * `ErPipeline.pairs` (SURVEY §7.4 "hot keys must be salted AND capped"),
  * plus an exact-signature contraction pre-pass:
  *
  *  ① **contraction**: items with IDENTICAL band vectors form dup groups (the
  *    exact-duplicate case); only one representative per group enters the band
  *    join, so 10⁶ identical docs contribute ONE row per bucket, not 10⁶.
  *    Within-group pairs are produced by the salted/capped triangular
  *    self-join on the signature itself (every member shares every band, so
  *    all C(g,2) pairs are candidates by construction).
  *  ② **band join over representatives**: re-expressed as `ErPipeline.pairs`
  *    with key = (band index, bucket value) — hot buckets salt at
  *    `saltThreshold` (grid cells ≤ T², exact same pair set) and drop at
  *    `maxBlockSize` with the pair mass reported, never silently.
  *  ③ **expansion**: each representative pair expands to all member×member
  *    pairs — linear in the OUTPUT size (two hash joins against the membership
  *    table), never in bucket-size².
  *
  * Output is exactly the naive candidate set (distinct unordered id pairs
  * sharing ≥1 band) minus pairs inside dropped blocks: two items with equal
  * signatures are candidates via band 0; two items with different signatures
  * are candidates iff their representatives are (identical vectors ⇒
  * identical band memberships). Defaults leave small-SF oracle outputs
  * byte-identical (nothing exceeds the thresholds at sf≤0.1).
  */
object BandedPairs {

  case class Stats(intra: ErPipeline.PairStats, cross: ErPipeline.PairStats) {
    def droppedPairsMass: Double = intra.droppedPairsMass + cross.droppedPairsMass
    def saltedBlocks: Long = intra.saltedBlocks + cross.saltedBlocks
  }

  /** `items`: (id: bigint, bands: array<bigint>) — one bucket value per band
    * index, same length for every row. Returns distinct (a_id < b_id) pairs.
    */
  def candidates(
      items: DataFrame,
      cfg: ErPipeline.PairConfig = ErPipeline.PairConfig()): (DataFrame, Stats) = {
    val spark = items.sparkSession
    import spark.implicits._

    // ① contraction: signature = the full band vector (exact string form —
    // hash keys would merge unrelated groups on collision and emit WRONG
    // pairs). Pinned once: the groups table feeds the intra self-join, the
    // rep band join, and both expansion joins.
    val members = graft.io.Persist.truncate(
      items.select($"id", concat_ws(",", $"bands").as("sig"))
        .withColumn("rep", min($"id").over(
          org.apache.spark.sql.expressions.Window.partitionBy($"sig")))
        .withColumn("g", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy($"sig"))))

    // within-group pairs: salted triangular self-join on the signature
    // (capped at maxBlockSize with reported mass — the planted-10k-dup case)
    val (intraPairs, intraStats) = ErPipeline.pairs(
      members.where($"g" > 1)
        .select($"id".cast("string").as("doc_id"), concat(lit("s:"), $"sig").as("key"))
        .as[ErPipeline.BlockRow],
      cfg)

    // ② representatives only enter the band join; bands re-derived from the
    // signature string (no second scan of the items table)
    val repBlocks = members.where($"id" === $"rep")
      .select($"id", posexplode(split($"sig", ",")))
      .select($"id".cast("string").as("doc_id"),
        concat(lit("b:"), $"pos", lit(":"), $"col").as("key"))
      .as[ErPipeline.BlockRow]
    val (repPairs, crossStats) = ErPipeline.pairs(repBlocks, cfg)

    // ③ expansion: rep pair -> all member×member pairs (groups are disjoint,
    // so each unordered pair arises exactly once; reps of one group never
    // pair with themselves)
    val cross = repPairs.toDF()
      .join(members.select($"rep".cast("string").as("a_id"), $"id".as("ga")), "a_id")
      .join(members.select($"rep".cast("string").as("b_id"), $"id".as("gb")), "b_id")
      .select(least($"ga", $"gb").as("a_id"), greatest($"ga", $"gb").as("b_id"))

    val intra = intraPairs.toDF()
      .select($"a_id".cast("long").as("ia"), $"b_id".cast("long").as("ib"))
      .select(least($"ia", $"ib").as("a_id"), greatest($"ia", $"ib").as("b_id"))

    (intra.unionByName(cross), Stats(intraStats, crossStats))
  }
}
