package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.model.{Doc, MatchConfig, Span}
import graft.pipeline.ErPipeline
import graft.streaming.IncrementalLink

/** The bucketed corpus actually pays off in a pipeline path (VERDICT r2 next-3):
  * the incremental-link score join must leave a doc_id-bucketed corpus in
  * place — no shuffle exchange over the corpus scan — and the streamed edges
  * must stay bit-equal to the plain parquet-corpus run.
  */
class BucketedCorpusSpec extends SparkSpec {

  private def doc(id: String, name: String, phone: String): Doc =
    Doc(id, Seq(
      Span("name", name, null, 0),
      Span("address", "12 oak street salem", null, 3),
      Span("phone", phone, null, 5)))

  test("two-sided score against a bucketed corpus: no shuffle over the corpus scan") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-bcorpus").toString
    val corpusDocs = (1 to 2000).map(i =>
      doc(f"c$i%05d", s"person $i", f"555${i % 97}%04d"))
    val newDocs = (1 to 50).map(i => doc(f"n$i%03d", s"person $i", f"555${i % 97}%04d"))
    val cfg = MatchConfig.fixture

    val corpusRecs = ErPipeline.extract(corpusDocs.toDS(), cfg)
    Tables.writeBucketed(corpusRecs.toDF(), "graft_corpus_b", s"$base/rec", "doc_id", 8)
    val newRecs = ErPipeline.extract(newDocs.toDS(), cfg).toDF()
      .localCheckpoint(true).as[ErPipeline.CleanRecord]

    val (pairIds, _) = ErPipeline.linkPairs(
      ErPipeline.block(newRecs), ErPipeline.block(corpusRecs))
    val pinnedPairs = pairIds.toDF().localCheckpoint(true).as[ErPipeline.PairIds]

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ: no trivial broadcast
    try {
      val bucketed = spark.table("graft_corpus_b").as[ErPipeline.CleanRecord]
      val scored = ErPipeline.score(pinnedPairs, newRecs, bucketed, cfg)
      val plan = scored.toDF().queryExecution.executedPlan
      // the corpus scan must be bucket-pruned-joinable: NO exchange anywhere
      // above the bucketed FileSourceScan
      val shufflesOverCorpus = plan.collect {
        case e: ShuffleExchangeExec if e.exists {
          case s: FileSourceScanExec => s.relation.bucketSpec.isDefined
          case _ => false
        } => e
      }
      assert(shufflesOverCorpus.isEmpty,
        s"corpus side re-shuffled: ${shufflesOverCorpus.map(_.nodeName)}")

      // and the scores are identical to the plain-parquet corpus run
      val plainScores = ErPipeline.score(pinnedPairs, newRecs, corpusRecs, cfg)
        .collect().map(s => (s.a_id, s.b_id) -> s.score).toMap
      val bucketedScores = scored.collect().map(s => (s.a_id, s.b_id) -> s.score).toMap
      assert(bucketedScores === plainScores && plainScores.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_corpus_b")
    }
  }

  test("lookup-flagged config: streamed edges equal batch LinkJob's (ADVICE r3)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // phone as the only lookup property: linkStream must derive the SAME
    // blocking scheme batch LinkJob stage ② derives (Blocking.fromConfig) —
    // before the fix, streaming silently used the default soundex+digits
    // scheme and generated a different candidate set
    val cfg = MatchConfig.fixture.copy(properties =
      MatchConfig.fixture.properties.map(p =>
        if (p.name == "phone") p.copy(lookup = "required") else p))
    val docs = Seq(
      doc("d1", "john smith", "5551234"), doc("x1", "maria garcia", "9990000"),
      doc("d2", "jon smith", "5551234"), doc("d3", "john smyth", "5551234"),
      doc("x2", "maria garcia", "9990000"))

    val out = Files.createTempDirectory("graft-lkbatch").toString
    graft.jobs.LinkJob.run(spark, docs.toDS(), cfg, out)
    val batchSet = spark.read.parquet(s"$out/edges").collect()
      .map { r =>
        val (a, b) = (r.getString(0), r.getString(1))
        (if (a < b) a else b, if (a < b) b else a)
      }.toSet

    val base = Files.createTempDirectory("graft-lkstream").toString
    val mem = MemoryStream[Doc]
    val q = IncrementalLink.linkStream(mem.toDS(), cfg,
      s"$base/corpus", s"$base/edges", s"$base/ckpt")
    try {
      mem.addData(docs(0), docs(1)); q.processAllAvailable()
      mem.addData(docs(2), docs(3), docs(4)); q.processAllAvailable()
      val streamedSet = spark.read.parquet(s"$base/edges").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(streamedSet === batchSet && streamedSet.nonEmpty)
    } finally q.stop()
  }

  test("linkStream with a bucketed corpus table: edges bit-equal to the parquet path") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val baseB = Files.createTempDirectory("graft-stream-b").toString
    val baseP = Files.createTempDirectory("graft-stream-p").toString

    def run(base: String, table: Option[String]): Set[(String, String)] = {
      val mem = MemoryStream[Doc]
      // the parquet-path run also exercises per-batch label-snapshot expiry
      val q = IncrementalLink.linkStream(
        mem.toDS(), MatchConfig.fixture,
        s"$base/corpus", s"$base/edges", s"$base/ckpt", corpusTable = table,
        clustersDir = Some(s"$base/clusters"), nClusterBuckets = 8,
        labelSnapshotsToKeep = if (table.isEmpty) Some(1) else None)
      try {
        mem.addData(doc("d1", "john smith", "5551234"), doc("x1", "maria garcia", "9990000"))
        q.processAllAvailable()
        mem.addData(doc("d2", "jon smith", "5551234"), doc("x2", "maria garcia", "9990000"))
        q.processAllAvailable()
        mem.addData(doc("d3", "john smyth", "5551234"))
        q.processAllAvailable()
        spark.read.parquet(s"$base/edges").collect()
          .map(r => (r.getString(0), r.getString(1))).toSet
      } finally q.stop()
    }

    try {
      val bucketedEdges = run(baseB, Some("graft_stream_corpus"))
      val parquetEdges = run(baseP, None)
      assert(bucketedEdges === parquetEdges && bucketedEdges.nonEmpty)
      assert(bucketedEdges.contains(("d1", "d2")))
      // incrementally maintained clusters == full CC over all edges, with
      // edge-free docs as singletons; every batch's labeling is
      // time-travelable through the snapshot table
      val ctbl = new graft.io.LabelStore(s"$baseB/clusters", 8)
      assert(ctbl.currentSnapshot === Some(3L)) // one snapshot per batch
      val got = ctbl.read(spark).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      val full = graft.pipeline.Cluster.connectedComponents(
        spark.read.parquet(s"$baseB/edges"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val allDocs = Set("d1", "d2", "d3", "x1", "x2")
      val want = allDocs.map(d => d -> full.getOrElse(d, d)).toMap
      assert(got === want)
      assert(ctbl.readSnapshot(spark, 1L).count() === 2L) // batch-1 labeling kept

      // partial rewrite (VERDICT r3 #2): batch 3 merges d3 into d1's cluster,
      // touching the cluster partitions of labels {d1, d3} only — the commit
      // must physically rewrite at most those 2 of 8 cluster partitions (and
      // only doc d3's partition in the doc-lookup layout), while the x1/x2
      // partitions keep riding on files from earlier snapshots
      val s3dirs = ctbl.dirsWrittenBy(3L)
      val (s3c, s3d) = s3dirs.partition(_.contains("/c/"))
      assert(s3c.nonEmpty && s3c.size <= 2,
        s"batch 3 should rewrite <= 2 cluster-label partitions, wrote: $s3c")
      assert(s3d.size <= 1,
        s"batch 3 changed only doc d3's mapping, but doc-layout wrote: $s3d")
      val manifest3 = Files.readString(
        java.nio.file.Paths.get(s"$baseB/clusters/snapshots/v3.json"))
      assert(manifest3.contains("data/s1/") || manifest3.contains("data/s2/"),
        s"untouched partitions must keep earlier snapshots' files: $manifest3")

      // the parquet run streamed with labelSnapshotsToKeep=1: only the final
      // snapshot's manifest remains, and its labeling still equals `want`
      val ptbl = new graft.io.LabelStore(s"$baseP/clusters", 8)
      assert(ptbl.currentSnapshot === Some(3L))
      assert(!Files.exists(java.nio.file.Paths.get(s"$baseP/clusters/snapshots/v1.json")))
      assert(!Files.exists(java.nio.file.Paths.get(s"$baseP/clusters/snapshots/v2.json")))
      val gotP = ptbl.read(spark).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(gotP === want)

      // per-batch streaming metrics: one row per batch, docs sum to the corpus
      val met = spark.read.parquet(s"$baseB/corpus/metrics")
      assert(met.count() === 3L)
      assert(met.agg(sum("docs")).collect()(0).getLong(0) === 5L)

      // the table really is bucketed and accumulated across batches
      // (refresh: the catalog's cached file listing predates the last append)
      spark.catalog.refreshTable("graft_stream_corpus")
      val tbl = spark.table("graft_stream_corpus")
      assert(tbl.count() === 5L)
      val cat = spark.sql("DESCRIBE TABLE EXTENDED graft_stream_corpus")
        .collect().map(r => r.getString(0) + " " + r.getString(1)).mkString("\n")
      assert(cat.contains("doc_id") && cat.toLowerCase.contains("bucket"), cat)
      // the corpus BLOCKS table is bucketed on the blocking key as well
      spark.catalog.refreshTable("graft_stream_corpus_blocks")
      val catB = spark.sql("DESCRIBE TABLE EXTENDED graft_stream_corpus_blocks")
        .collect().map(r => r.getString(0) + " " + r.getString(1)).mkString("\n")
      assert(catB.contains("key") && catB.toLowerCase.contains("bucket"), catB)
      assert(spark.table("graft_stream_corpus_blocks").count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_stream_corpus")
      spark.sql("DROP TABLE IF EXISTS graft_stream_corpus_blocks")
    }
  }
}
