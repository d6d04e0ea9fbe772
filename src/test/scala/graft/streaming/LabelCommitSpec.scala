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

  private def labelsOf(dir: String): Seq[(String, String)] =
    new HashPartitionedTable(dir, "cluster_id", 8).read(spark)
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
}
