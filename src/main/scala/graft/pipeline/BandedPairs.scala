package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-safe candidate generation for banded near-dup schemes (MinHash-LSH
  * bands, SimHash sub-keys, sign-LSH buckets — SURVEY.md §2 LLM-pipeline ops).
  *
  * The naive shape — `bands.join(bands, (band_ix, band_val))` — is quadratic
  * in the hottest bucket: a dup-heavy crawl corpus (10⁶ copies of one
  * boilerplate page sharing every band) turns one key cell into 10¹²
  * candidate rows. This module applies the `ErPipeline.pairs` discipline
  * (SURVEY §7.4 "hot keys must be salted AND capped") to band buckets, plus
  * an exact-signature contraction pre-pass:
  *
  *  ① **contraction**: items with IDENTICAL band vectors form dup groups (the
  *    exact-duplicate case); only one representative per group enters the band
  *    join, so 10⁶ identical docs contribute ONE row per bucket, not 10⁶.
  *  ② **within-group pairs**: every member shares every band, so all C(g,2)
  *    pairs are candidates by construction — produced by a salted triangular
  *    self-join on the signature, capped at `maxBlockSize` (pair mass
  *    reported via `Stats`, never silently).
  *  ③ **band join over representatives**: the same salted triangular
  *    self-join per (band index, bucket value) key — every cell sees ≤ T²
  *    rows no matter how hot the bucket; over-cap buckets drop with mass.
  *  ④ **expansion**: each representative pair expands to all member×member
  *    pairs — linear in the OUTPUT size (two hash joins against the
  *    membership table), never in bucket-size².
  *
  * Block sizes ride on every row via one count-window per key (no discovery
  * aggregation jobs, no driver collects — the whole candidate plan is lazy;
  * `candidates` adds one stats aggregate for callers that want the skew
  * report, `candidatePairs` skips even that). Output is exactly the naive
  * candidate set (distinct unordered id pairs sharing ≥1 band) minus pairs
  * inside dropped blocks: two items with equal signatures are candidates via
  * band 0; two items with different signatures are candidates iff their
  * representatives are (identical vectors ⇒ identical band memberships).
  * Defaults leave small-SF oracle outputs byte-identical (nothing exceeds
  * the thresholds at sf≤0.1).
  */
object BandedPairs {

  case class Stats(intra: ErPipeline.PairStats, cross: ErPipeline.PairStats) {
    def droppedPairsMass: Double = intra.droppedPairsMass + cross.droppedPairsMass
    def saltedBlocks: Long = intra.saltedBlocks + cross.saltedBlocks
  }

  /** Salted triangular self-join: rows already carry their block size `n`
    * under (key columns) — cells (i,j), i ≤ j, each ≤ T×T; every unordered
    * in-block pair appears exactly once. Over-cap blocks are filtered out.
    */
  private def triangular(
      sized: DataFrame, // (keyCols..., id, n)
      keyCols: Seq[String],
      cfg: ErPipeline.PairConfig): DataFrame = {
    val kept = sized.where(col("n") <= cfg.maxBlockSize)
      .withColumn("salts", ceil(col("n") / cfg.saltThreshold).cast("int"))
      .withColumn("salt", pmod(xxhash64(col("id")), col("salts")).cast("int"))
    val left = kept.withColumn("cj", explode(sequence(col("salt"), col("salts") - 1)))
      .select(keyCols.map(col) ++ Seq(col("id").as("ia"), col("salt").as("ci"), col("cj")): _*)
    val right = kept.withColumn("ci", explode(sequence(lit(0), col("salt"))))
      .select(keyCols.map(col) ++ Seq(col("id").as("ib"), col("ci"), col("salt").as("cj")): _*)
    left.join(right, keyCols ++ Seq("ci", "cj"))
      .where((col("ci") =!= col("cj")) || (col("ia") < col("ib")))
      .select(least(col("ia"), col("ib")).as("a_id"),
        greatest(col("ia"), col("ib")).as("b_id"))
  }

  /** `items`: (id: bigint, bands: array<bigint>) — one bucket value per band
    * index, same length for every row. Returns distinct (a_id < b_id) pairs;
    * entirely lazy (no jobs run until the result is consumed, beyond the
    * contraction pin).
    */
  def candidatePairs(
      items: DataFrame,
      cfg: ErPipeline.PairConfig = ErPipeline.PairConfig()): DataFrame =
    build(items, cfg)._1

  /** As `candidatePairs`, plus the skew report (one extra aggregate job). */
  def candidates(
      items: DataFrame,
      cfg: ErPipeline.PairConfig = ErPipeline.PairConfig()): (DataFrame, Stats) = {
    val (pairs, statsDf) = build(items, cfg)
    val r = statsDf.collect()(0)
    (pairs, Stats(
      ErPipeline.PairStats(r.getLong(0), r.getDouble(1), r.getLong(2)),
      ErPipeline.PairStats(r.getLong(3), r.getDouble(4), r.getLong(5))))
  }

  private def build(
      items: DataFrame,
      cfg: ErPipeline.PairConfig): (DataFrame, DataFrame) = {
    val spark = items.sparkSession
    import spark.implicits._

    // ① contraction: signature = the full band vector (exact string form —
    // hash keys would merge unrelated groups on collision and emit WRONG
    // pairs). One narrow shuffle on sig computes rep + group size; pinned
    // once — the intra join, the rep band join, both expansion joins and the
    // stats aggregate all read the materialized (id, sig, rep, g).
    // an item with NO bands shares nothing with anyone — it must not fall
    // into a common "" signature group (which would fabricate intra pairs)
    val bySig = Window.partitionBy($"sig")
    val members = graft.io.Persist.truncate(
      items.where(size($"bands") > 0)
        .select($"id", concat_ws(",", $"bands").as("sig"))
        .withColumn("rep", min($"id").over(bySig))
        .withColumn("g", count(lit(1)).over(bySig)))

    // ② within-group pairs (the group size g is already a column)
    val intra = triangular(
      members.where($"g" > 1).select($"sig", $"id", $"g".as("n")),
      Seq("sig"), cfg)

    // ③ representatives only enter the band join; bands re-derived from the
    // signature string (no second scan of the items table). Over-cap groups
    // keep their representative here: the drop bounds the WITHIN-group
    // blowup, while the rep still links its group outward. Bucket sizes via
    // one count-window per (band_ix, band_val) key — linear, never pairwise.
    val repBands = members.where($"id" === $"rep")
      .select($"id", posexplode(split($"sig", ",")))
      .withColumnRenamed("pos", "bix").withColumnRenamed("col", "bval")
    val sizedBands = repBands.withColumn(
      "n", count(lit(1)).over(Window.partitionBy($"bix", $"bval")))
    val repPairs = triangular(sizedBands, Seq("bix", "bval"), cfg)
      .distinct() // a rep pair sharing several bands must expand once

    // ④ expansion: rep pair -> all member×member pairs (groups are disjoint,
    // so each unordered pair arises exactly once)
    val cross = repPairs
      .join(members.select($"rep".as("a_id"), $"id".as("ga")), "a_id")
      .join(members.select($"rep".as("b_id"), $"id".as("gb")), "b_id")
      .select(least($"ga", $"gb").as("a_id"), greatest($"ga", $"gb").as("b_id"))

    // skew report (lazy): dropped blocks + their pair mass + salted counts,
    // for the signature groups and the band buckets respectively
    val intraStats = members.where($"id" === $"rep").agg(
      count(when($"g" > cfg.maxBlockSize, 1)).as("i_dropped"),
      coalesce(sum(when($"g" > cfg.maxBlockSize,
        ($"g" * ($"g" - 1) / 2).cast("double"))), lit(0.0)).as("i_mass"),
      count(when($"g" > cfg.saltThreshold && $"g" <= cfg.maxBlockSize, 1)).as("i_salted"))
    val crossStats = sizedBands.groupBy($"bix", $"bval").agg(first($"n").as("n"))
      .agg(
        count(when($"n" > cfg.maxBlockSize, 1)).as("c_dropped"),
        coalesce(sum(when($"n" > cfg.maxBlockSize,
          ($"n" * ($"n" - 1) / 2).cast("double"))), lit(0.0)).as("c_mass"),
        count(when($"n" > cfg.saltThreshold && $"n" <= cfg.maxBlockSize, 1)).as("c_salted"))

    (intra.unionByName(cross), intraStats.crossJoin(crossStats))
  }
}
