package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.HashPartitionedTable

/** The shared per-batch label-commit must be idempotent under foreachBatch's
  * at-least-once replay: a crash BETWEEN the label commit and the corpus
  * append re-runs the batch with `seenIds` lagging the labels, and the
  * replayed commit must not duplicate rows or change the labeling.
  */
class LabelCommitSpec extends SparkSpec {
  import spark.implicits._

  private def edges(ps: (String, String)*) = ps.toDF("a_id", "b_id")
  private def ids(is: String*) = is.toDF("doc_id")

  // bucket count must match the writer's (read() derives dirs purely from
  // the manifest today, but a pruning read would need the real count)
  private def labelsOf(dir: String, nBuckets: Int = 8): Seq[(String, String)] =
    new HashPartitionedTable(dir, "cluster_id", nBuckets).read(spark)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted

  test("replayed batch (labels ahead of every other artifact) is a no-op on content") {
    val dir = Files.createTempDirectory("graft-labelcommit").toString
    // batch 1: d1-d2 edge + edge-free singleton s1
    LabelCommit.commit(spark, dir, 8, edges("d1" -> "d2"), ids("d1", "d2", "s1"),
      keepSnapshots = None)
    val after1 = labelsOf(dir)
    assert(after1 === Seq("d1" -> "d1", "d2" -> "d1", "s1" -> "s1"))

    // batch 2: new doc d3 joins the cluster, singleton s2
    val b2Edges = edges("d2" -> "d3")
    val b2Ids = ids("d2", "d3", "s2")
    LabelCommit.commit(spark, dir, 8, b2Edges, b2Ids, None)
    val after2 = labelsOf(dir)
    assert(after2 === Seq("d1" -> "d1", "d2" -> "d1", "d3" -> "d1", "s1" -> "s1", "s2" -> "s2"))

    // REPLAY batch 2 (the crash window: labels committed, corpus append
    // lost, stream re-runs the batch). The replayed singleton s2 and the
    // replayed member d3 are already labeled — possibly in OTHER clusters'
    // partitions — and must not duplicate. No new rows, same labels.
    LabelCommit.commit(spark, dir, 8, b2Edges, b2Ids, None)
    assert(labelsOf(dir) === after2)
  }

  test("property: random batch streams with random replays equal full CC (seeded)") {
    import spark.implicits._
    for (seed <- Seq(11, 47)) {
      val r = new scala.util.Random(seed)
      val dir = Files.createTempDirectory(s"graft-lc-fuzz$seed").toString
      val allEdges = scala.collection.mutable.ArrayBuffer[(String, String)]()
      val allIds = scala.collection.mutable.Set[String]()
      var nextId = 0
      for (_ <- 1 to 5) {
        // each batch: a few brand-new docs, edges among new docs and back to
        // random earlier docs (cross-batch cluster growth + merges)
        val fresh = (1 to (2 + r.nextInt(4))).map { _ =>
          nextId += 1; f"d$nextId%04d"
        }
        val pool = (allIds.toSeq.sorted ++ fresh)
        val batchEdges = (1 to r.nextInt(4)).flatMap { _ =>
          val a = fresh(r.nextInt(fresh.size))
          val b = pool(r.nextInt(pool.size))
          if (a == b) None else Some((a, b))
        }
        allEdges ++= batchEdges
        allIds ++= fresh
        val commitOnce = () => LabelCommit.commit(spark, dir, 4,
          batchEdges.toDF("a_id", "b_id"), fresh.toDF("doc_id"), None)
        commitOnce()
        if (r.nextBoolean()) commitOnce() // at-least-once replay
      }
      val got = labelsOf(dir, nBuckets = 4).toMap
      val full =
        if (allEdges.isEmpty) Map.empty[String, String]
        else graft.pipeline.Cluster.connectedComponents(allEdges.toSeq.toDF("a", "b"))
          .collect().map(x => x.getString(0) -> x.getString(1)).toMap
      val want = allIds.map(d => d -> full.getOrElse(d, d)).toMap
      assert(got === want, s"seed=$seed")
    }
  }
}
