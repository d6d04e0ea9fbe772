package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.io.Tables

/** Trickle-batch probe pruning (ProbePrune): the redundant `key IN (...)`
  * hint must (a) leave results untouched — it is implied by the downstream
  * equi-join — and (b) actually prune bucket files of the accumulated
  * corpus-blocks table, so a small batch stops paying an O(corpus) scan.
  * End-to-end invariance is additionally covered by every streaming spec
  * (IncrementalDedupSpec's streamed-equals-batch decisions,
  * StreamRecoverySpec's bit-equality runs) since both streaming paths now
  * route their corpus-blocks probes through ProbePrune.
  */
class ProbePruneSpec extends SparkSpec {

  /** Final (post-AQE) physical plan as text — query stages hide their plans
    * from `children`, so string inspection is the robust cross-shape probe
    * (the PlanProofsSpec convention).
    */
  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize any adaptive plan before inspecting
    df.queryExecution.executedPlan.toString
  }

  private val SelectedBuckets = """SelectedBucketsCount: (\d+) out of (\d+)""".r

  test("small batch: bucket files pruned, rows identical to unpruned probe") {
    import spark.implicits._
    val base = Files.createTempDirectory("probeprune").toString
    // accumulated corpus blocks: keys spread over all 8 buckets, 2 batches
    val corpus0 = (1 to 400).map(i => (s"key$i", s"d$i")).toDF("key", "doc_id")
    val corpus1 = (401 to 800).map(i => (s"key$i", s"d$i")).toDF("key", "doc_id")
    Tables.writeBatchBucketed(corpus0, "graft_pp_blocks", s"$base/blocks", "key", 8, 0L)
    Tables.writeBatchBucketed(corpus1, "graft_pp_blocks", s"$base/blocks", "key", 8, 1L)

    val batchBlocks = Seq(("key7", "n1"), ("key401", "n2")).toDF("key", "doc_id")
    val old = spark.table("graft_pp_blocks")
      .where($"batch_id" < 2).drop("batch_id")

    val pruned = ProbePrune(old, batchBlocks, "key")
    // (a) result invariance vs the unpruned probe restricted by the join
    val viaJoin = old.join(batchBlocks.select("key").distinct(), "key")
      .select("key", "doc_id").collect().toSet
    assert(pruned.select("key", "doc_id").collect().toSet === viaJoin)
    assert(pruned.count() === 2)

    // (b) the scan prunes bucket FILES in the real per-batch plan shape —
    // linkPairs aggregates/joins on `key`, which keeps the bucketed scan
    // alive (a bare filter lets the planner drop the bucketed-scan property
    // and with it file-level pruning — probed on 4.1.2), so assert through
    // a groupBy-on-key like the production path. Two keys hash into ≤ 2 of
    // the 8 buckets. The pushed In-filter additionally skips row groups.
    val plan = planOf(pruned.groupBy("key").count())
    SelectedBuckets.findFirstMatchIn(plan) match {
      case Some(m) =>
        val (picked, total) = (m.group(1).toInt, m.group(2).toInt)
        assert(total === 8 && picked >= 1 && picked <= 2,
          s"expected <= 2 of 8 buckets selected, got ${m.matched}")
      case None => fail(s"no bucket pruning in plan:\n$plan")
    }
    assert(plan.contains("In(key"), "In filter not pushed to the scan")
  }

  test("records/fps b-side prune: doc_id IN-list prunes corpus bucket files") {
    import spark.implicits._
    // the VERDICT r5 #1 path: the score join's b-side (linkStream records)
    // and the verify fps read (nearDupStream) now route the bounded
    // candidate-b-id set through ProbePrune against their doc_id-bucketed
    // corpus tables — a trickle batch must open only the affected buckets'
    // files, and the filter must be result-invariant under the downstream
    // equi-join on doc_id
    val base = Files.createTempDirectory("probeprune3").toString
    val recs0 = (1L to 400L).map(i => (i, Seq(i, i + 1))).toDF("doc_id", "fps")
    val recs1 = (401L to 800L).map(i => (i, Seq(i, i + 1))).toDF("doc_id", "fps")
    Tables.writeBatchBucketed(recs0, "graft_pp3_fps", s"$base/fps", "doc_id", 8, 0L)
    Tables.writeBatchBucketed(recs1, "graft_pp3_fps", s"$base/fps", "doc_id", 8, 1L)
    val old = spark.table("graft_pp3_fps").where($"batch_id" < 2).drop("batch_id")

    val candidateBIds = Seq(7L, 401L).toDF("doc_id")
    val pruned = ProbePrune(old, candidateBIds, "doc_id")
    // (a) result invariance vs the unpruned b-side restricted by the join
    val viaJoin = old.join(candidateBIds, "doc_id")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(pruned.join(candidateBIds, "doc_id")
      .select($"doc_id").collect().map(_.getLong(0)).toSet === viaJoin)
    assert(viaJoin === Set(7L, 401L))
    // (b) bucket-FILE pruning in the non-broadcast join shape (the at-scale
    // plan: the accumulated corpus is never the broadcast side, so the scan
    // keeps its bucketed distribution and the In filter selects buckets —
    // probed on 4.1.2: `SelectedBucketsCount: 2 out of 8`). In the
    // trickle-broadcast shape the planner drops the bucketed scan and only
    // the pushed In filter prunes (row groups via the sortBy(doc_id) column
    // stats) — documented, still O(affected data), but file listing is not
    // reduced there.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val plan = planOf(pruned.join(candidateBIds, "doc_id"))
      SelectedBuckets.findFirstMatchIn(plan) match {
        case Some(m) =>
          val (picked, total) = (m.group(1).toInt, m.group(2).toInt)
          assert(total === 8 && picked >= 1 && picked <= 2,
            s"expected <= 2 of 8 buckets selected, got ${m.matched}")
        case None => fail(s"no bucket pruning in plan:\n$plan")
      }
      assert(plan.contains("In(doc_id"), "In filter not pushed to the scan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("above maxKeys the probe stays unfiltered (full-scan plan)") {
    import spark.implicits._
    val base = Files.createTempDirectory("probeprune2").toString
    val corpus = (1 to 100).map(i => (s"key$i", s"d$i")).toDF("key", "doc_id")
    Tables.writeBatchBucketed(corpus, "graft_pp2_blocks", s"$base/blocks", "key", 4, 0L)
    val old = spark.table("graft_pp2_blocks")
      .where($"batch_id" < 1).drop("batch_id")
    val batchBlocks = (1 to 10).map(i => (s"key$i", s"n$i")).toDF("key", "doc_id")

    val capped = ProbePrune(old, batchBlocks, "key", maxKeys = 5)
    assert(capped.count() === 100) // no filter applied: full corpus visible
    val cappedPlan = planOf(capped.groupBy("key").count())
    assert(SelectedBuckets.findFirstMatchIn(cappedPlan)
      .forall(m => m.group(1) === m.group(2)), "capped probe must not prune")

    val uncapped = ProbePrune(old, batchBlocks, "key", maxKeys = 1024)
    assert(uncapped.count() === 10)
  }
}
