package graft

import org.apache.spark.sql.functions._

import graft.pipeline.ErPipeline
import graft.pipeline.ErPipeline.{BlockRow, PairConfig}

/** Candidate pair generation (SURVEY.md §2.6 J1/J3): the salted triangular
  * self-join must produce EXACTLY the naive per-block pair set — every
  * unordered pair exactly once, no self pairs — independent of salting, and
  * the skew cap must drop (and report) oversized blocks, never silently.
  */
class PairsSpec extends SparkSpec {

  private def naivePairs(rows: Seq[BlockRow]): Set[(String, String)] =
    rows.groupBy(_.key).values.flatMap { grp =>
      val ids = grp.map(_.doc_id).distinct.sorted
      for (i <- ids.indices; j <- (i + 1) until ids.size) yield (ids(i), ids(j))
    }.toSet

  private def run(rows: Seq[BlockRow], cfg: PairConfig): (Set[(String, String)], ErPipeline.PairStats) = {
    import spark.implicits._
    val (pairs, stats) = ErPipeline.pairs(rows.toDS(), cfg)
    (pairs.collect().map(p => (p.a_id, p.b_id)).toSet, stats)
  }

  test("unsalted small blocks: exact pair set") {
    val rows = Seq(
      BlockRow("a", "k1"), BlockRow("b", "k1"), BlockRow("c", "k1"),
      BlockRow("a", "k2"), BlockRow("d", "k2"),
      BlockRow("e", "k3"))
    val (got, stats) = run(rows, PairConfig())
    assert(got === Set(("a", "b"), ("a", "c"), ("b", "c"), ("a", "d")))
    assert(stats.saltedBlocks === 0)
    assert(stats.droppedBlocks === 0)
  }

  test("salted hot block: same pair set as naive, every pair exactly once") {
    val r = new scala.util.Random(29)
    // one hot key (70 docs, saltThreshold 16 -> ~5 salts), several normal keys
    val rows =
      (1 to 70).map(i => BlockRow(f"h$i%03d", "hot")) ++
        (1 to 40).map(i => BlockRow(f"x$i%03d", s"k${r.nextInt(12)}")) ++
        (1 to 10).map(i => BlockRow(f"h$i%03d", s"k${r.nextInt(12)}")) // overlap docs
    val (got, stats) = run(rows, PairConfig(saltThreshold = 16))
    assert(got === naivePairs(rows))
    assert(stats.saltedBlocks >= 1)
    assert(stats.droppedBlocks === 0)
    // dedup check is implied by Set ==, but also verify multiplicity directly
    import spark.implicits._
    val (pairsDs, _) = ErPipeline.pairs(rows.toDS(), PairConfig(saltThreshold = 16))
    val dupCount = pairsDs.groupBy($"a_id", $"b_id").count().where($"count" > 1).count()
    assert(dupCount === 0)
  }

  test("multi-key co-occurrence yields one pair with the smallest key") {
    val rows = Seq(
      BlockRow("a", "k2"), BlockRow("b", "k2"),
      BlockRow("a", "k1"), BlockRow("b", "k1"))
    import spark.implicits._
    val (pairs, _) = ErPipeline.pairs(rows.toDS(), PairConfig())
    val got = pairs.collect()
    assert(got.length === 1)
    assert(got(0).a_id === "a" && got(0).b_id === "b" && got(0).block_key === "k1")
  }

  test("oversized blocks are dropped and reported (quadratic-blowup guard)") {
    val rows =
      (1 to 50).map(i => BlockRow(s"big$i", "huge")) ++
        Seq(BlockRow("a", "ok"), BlockRow("b", "ok"))
    val (got, stats) = run(rows, PairConfig(saltThreshold = 8, maxBlockSize = 20))
    assert(got === Set(("a", "b")))
    assert(stats.droppedBlocks === 1)
    assert(stats.droppedPairsMass === 50.0 * 49 / 2)
  }

  test("linkPairs (J2, A-vs-B): exact cross-corpus pair set, salted, no dedup losses") {
    import spark.implicits._
    val r = new scala.util.Random(43)
    val a = (1 to 120).map(i => BlockRow(f"a$i%03d", s"k${r.nextInt(8)}")) ++
      (1 to 30).map(i => BlockRow(f"a$i%03d", "hot"))
    val b = (1 to 150).map(i => BlockRow(f"b$i%03d", s"k${r.nextInt(8)}")) ++
      (1 to 40).map(i => BlockRow(f"b$i%03d", "hot"))
    val naive = (for {
      ra <- a; rb <- b if ra.key == rb.key
    } yield (ra.doc_id, rb.doc_id)).toSet
    val (pairs, stats) = ErPipeline.linkPairs(a.toDS(), b.toDS(),
      PairConfig(saltThreshold = 16))
    val got = pairs.collect().map(p => (p.a_id, p.b_id)).toSet
    assert(got === naive)
    assert(stats.saltedBlocks >= 1)
    val dup = pairs.groupBy($"a_id", $"b_id").count().where($"count" > 1).count()
    assert(dup === 0)

    // grid salting, A-side-only-hot: sa > 1, sb = 1 — exact set, no dupes
    val a2 = (1 to 60).map(i => BlockRow(f"x$i%03d", "hh"))
    val b2 = (1 to 5).map(i => BlockRow(f"y$i%03d", "hh"))
    val (p2, st2) = ErPipeline.linkPairs(a2.toDS(), b2.toDS(), PairConfig(saltThreshold = 8))
    val got2 = p2.collect().map(p => (p.a_id, p.b_id)).toSet
    assert(got2 === (for (ra <- a2; rb <- b2) yield (ra.doc_id, rb.doc_id)).toSet)
    assert(st2.saltedBlocks === 1)
  }

  test("linkPairs uniqueKeys fast path equals the deduped path (single-keyer)") {
    import spark.implicits._
    val r = new scala.util.Random(47)
    // single key PER DOC (the uniqueKeys contract), including a salted hot key
    val a = (1 to 120).map(i => BlockRow(f"a$i%03d", if (i <= 40) "hot" else s"k${r.nextInt(6)}"))
    val b = (1 to 130).map(i => BlockRow(f"b$i%03d", if (i <= 50) "hot" else s"k${r.nextInt(6)}"))
    def rows(unique: Boolean) = {
      val (p, _) = ErPipeline.linkPairs(a.toDS(), b.toDS(),
        PairConfig(saltThreshold = 16), uniqueKeys = unique)
      p.collect().map(x => (x.a_id, x.b_id, x.block_key)).sorted.toSeq
    }
    // identical MULTISET (sorted seq compare): the fast path must not drop
    // pairs or emit duplicates when the precondition holds
    assert(rows(unique = true) === rows(unique = false))
  }

  test("pair set is independent of input partitioning and shuffle partitions") {
    val r = new scala.util.Random(31)
    val rows = (1 to 300).map(i => BlockRow(f"d$i%04d", s"k${r.nextInt(20)}")) ++
      (1 to 60).map(i => BlockRow(f"d$i%04d", "hot"))
    import spark.implicits._
    val base = run(rows, PairConfig(saltThreshold = 10))._1
    val shuffled = {
      val (p, _) = ErPipeline.pairs(
        rows.toDS().repartition(17), PairConfig(saltThreshold = 10))
      p.collect().map(x => (x.a_id, x.b_id)).toSet
    }
    assert(shuffled === base)
    assert(base === naivePairs(rows))
  }
}
