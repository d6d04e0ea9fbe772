package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.{EdgeLog, LabelStore}
import graft.model.{Doc, MatchConfig, Span}

/** VERDICT r4 #1/#4: every per-batch streaming write must be
  * replay-idempotent under foreachBatch's at-least-once contract. These
  * tests kill a REAL StreamingQuery mid-batch — the `onBatchComplete` hook
  * throws AFTER all of the batch's artifacts (edges, labels, metrics,
  * corpus) have landed but BEFORE the engine commits the checkpoint, the
  * exact crash window that used to duplicate edges and corpus rows — then
  * restart from the same checkpoint and assert every artifact equals an
  * uninterrupted control run, as multisets (set-equality would mask
  * duplicates, the very bug under test).
  */
class StreamRecoverySpec extends SparkSpec {

  private def doc(id: String, name: String, phone: String): Doc =
    Doc(id, Seq(
      Span("name", name, null, 0),
      Span("address", "12 oak street salem", null, 3),
      Span("phone", phone, null, 5)))

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toSeq).toSeq
      .sortBy(_.mkString("|"))

  /** The file source lists only files directly under its path — stage the
    * batch as a one-part dir, then move the part file in as `b<i>.parquet`.
    */
  private def landBatch(df: DataFrame, in: String, i: Int): Unit = {
    val stage = Files.createTempDirectory("graft-rec-stage").toFile
    df.coalesce(1).write.mode("overwrite").parquet(stage.getAbsolutePath)
    val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, java.nio.file.Paths.get(in, s"b$i.parquet"))
  }

  test("linkStream kill mid-batch + restart: all artifacts equal an uninterrupted run") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-rec-in").toString
    val crashed = Files.createTempDirectory("graft-rec-crash").toString
    val control = Files.createTempDirectory("graft-rec-ctl").toString
    val cfg = MatchConfig.fixture
    val batches = Seq(
      Seq(doc("d1", "john smith", "5551234"), doc("x1", "maria garcia", "9990000")),
      Seq(doc("d2", "jon smith", "5551234"), doc("x2", "maria garcia", "9990000")),
      Seq(doc("d3", "john smyth", "5551234")))

    def stream(base: String, hook: Long => Unit) =
      IncrementalLink.linkStream(
        spark.readStream.schema(Encoders.product[Doc].schema)
          .option("maxFilesPerTrigger", "1").parquet(in).as[Doc],
        cfg, s"$base/corpus", s"$base/edges", s"$base/ckpt",
        clustersDir = Some(s"$base/clusters"),
        onBatchComplete = hook)

    def addBatch(i: Int): Unit = landBatch(batches(i).toDS().toDF(), in, i)

    // ---- crashed run: batch 0 ok; batch 1 writes everything then dies ----
    val failNext = new AtomicBoolean(false)
    val hook: Long => Unit = _ =>
      if (failNext.getAndSet(false)) throw new RuntimeException("injected crash")
    val q1 = stream(crashed, hook)
    try {
      addBatch(0); q1.processAllAvailable()
      failNext.set(true)
      addBatch(1)
      intercept[Exception] { q1.processAllAvailable() }
    } finally q1.stop()
    // the crash landed AFTER the batch-1 artifact writes: edges for both
    // batches exist on disk, but batch 1 is uncommitted in the checkpoint
    assert(spark.read.parquet(s"$crashed/edges").count() >= 1)

    // ---- restart from the same checkpoint: batch 1 REPLAYS fully ----
    val q2 = stream(crashed, _ => ())
    try {
      q2.processAllAvailable() // replay of uncommitted batch 1
      addBatch(2); q2.processAllAvailable()
    } finally q2.stop()

    // ---- control: same batches, never interrupted ----
    def runControl(): Unit = {
      val q = stream(control, _ => ())
      try {
        // the input dir already holds f0..f2; replay them one per trigger
        q.processAllAvailable()
      } finally q.stop()
    }
    runControl()

    // edges: multiset-equal, and no duplicate pairs at all
    val crashedEdges = rows(EdgeLog.read(spark, s"$crashed/edges"))
    val controlEdges = rows(EdgeLog.read(spark, s"$control/edges"))
    assert(crashedEdges === controlEdges, "edges diverged after crash-replay")
    assert(crashedEdges.distinct.size === crashedEdges.size, "duplicate edges")
    assert(crashedEdges.nonEmpty)

    // corpus records + blocks: multiset-equal, no duplicated docs
    for (sub <- Seq("records", "blocks")) {
      val c = rows(spark.read.parquet(s"$crashed/corpus/$sub").drop("batch_id"))
      val t = rows(spark.read.parquet(s"$control/corpus/$sub").drop("batch_id"))
      assert(c === t, s"corpus/$sub diverged after crash-replay")
    }
    val docsSeen = spark.read.parquet(s"$crashed/corpus/records")
      .select("doc_id").collect().map(_.getString(0)).toSeq
    assert(docsSeen.distinct.size === docsSeen.size, "duplicate corpus docs")

    // labels: equal, and the doc-layout mirror intact
    val sc = new LabelStore(s"$crashed/clusters", 8)
    val st = new LabelStore(s"$control/clusters", 8)
    val lc = rows(sc.read(spark))
    assert(lc === rows(st.read(spark)), "labels diverged after crash-replay")
    assert(lc === rows(sc.readDocPartitions(spark, (0 until 8).toSet)))

    // metrics: one row per batch, same totals
    val mc = spark.read.parquet(s"$crashed/corpus/metrics")
    assert(mc.count() === 3L)
    assert(mc.agg(sum("docs")).collect()(0).getLong(0) === 5L)
  }

  test("nearDupStream (bucketed tables) kill mid-batch + restart, then compaction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = Files.createTempDirectory("graft-rec2-in").toString
    val base = Files.createTempDirectory("graft-rec2").toString
    val ctl = Files.createTempDirectory("graft-rec2-ctl").toString
    val txt = (1 to 20).map(i => s"tok$i").mkString(" ")
    val variant = txt.split(' ').dropRight(1).mkString(" ") + " zzz"
    val batches = Seq(
      Seq(1L -> txt, 2L -> txt, 30L -> (1 to 20).map(i => s"other$i").mkString(" ")),
      Seq(10L -> variant, 31L -> (1 to 20).map(i => s"unrelated$i").mkString(" ")),
      Seq(3L -> txt))

    def stream(b: String, table: Option[String], hook: Long => Unit) =
      IncrementalDedup.nearDupStream(
        spark.readStream
          .schema("doc_id BIGINT, text STRING")
          .option("maxFilesPerTrigger", "1").parquet(in).toDF(),
        s"$b/corpus", s"$b/edges", s"$b/ckpt", corpusTable = table,
        clustersDir = Some(s"$b/clusters"), onBatchComplete = hook)

    def addBatch(i: Int): Unit =
      landBatch(batches(i).toDF("doc_id", "text"), in, i)

    try {
      val failNext = new AtomicBoolean(false)
      val hook: Long => Unit = _ =>
        if (failNext.getAndSet(false)) throw new RuntimeException("injected crash")
      val q1 = stream(base, Some("graft_rec_corpus"), hook)
      try {
        addBatch(0); q1.processAllAvailable()
        failNext.set(true)
        addBatch(1)
        intercept[Exception] { q1.processAllAvailable() }
      } finally q1.stop()

      // compact WHILE CRASHED (batch 1's artifacts on disk, checkpoint
      // uncommitted): the keep-newest fold must leave batch 1's partitions
      // un-folded so the restart's replay overwrites them in place instead
      // of duplicating rows beside a folded copy
      graft.jobs.MaintenanceJob.run(spark, Seq("compact-edges", s"$base/edges"))
      graft.jobs.MaintenanceJob.run(spark, Seq("compact-corpus",
        "graft_rec_corpus_fps", s"$base/corpus/fps", "doc_id", "8"))
      graft.jobs.MaintenanceJob.run(spark, Seq("compact-corpus",
        "graft_rec_corpus_bands", s"$base/corpus/bandblocks", "key", "8"))

      val q2 = stream(base, Some("graft_rec_corpus"), _ => ())
      try {
        q2.processAllAvailable()
        addBatch(2); q2.processAllAvailable()
      } finally q2.stop()

      val qc = stream(ctl, None, _ => ())
      try qc.processAllAvailable() finally qc.stop()

      val got = rows(EdgeLog.read(spark, s"$base/edges"))
      assert(got === rows(EdgeLog.read(spark, s"$ctl/edges")), "edges diverged")
      assert(got.distinct.size === got.size && got.nonEmpty)
      // bucketed corpus: exactly one row per doc despite the replayed batch
      spark.catalog.refreshTable("graft_rec_corpus_fps")
      val fpsDocs = spark.table("graft_rec_corpus_fps")
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(fpsDocs.distinct.size === fpsDocs.size && fpsDocs.size === 6)
      val labels = new LabelStore(s"$base/clusters", 8).read(spark)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = new LabelStore(s"$ctl/clusters", 8).read(spark)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(labels === want)

      // ---- maintenance on the stopped stream: compact edges + both tables
      // (through the operations CLI dispatch, which these calls also test) ----
      val preEdges = rows(EdgeLog.read(spark, s"$base/edges"))
      graft.jobs.MaintenanceJob.run(spark,
        Seq("compact-edges", s"$base/edges"))
      assert(rows(EdgeLog.read(spark, s"$base/edges")) === preEdges)
      // keep-newest fold: exactly the folded partition plus the newest batch
      // (the one a crashed stream's restart would replay-overwrite in place)
      val edgeParts = new java.io.File(s"$base/edges").listFiles()
        .filter(_.getName.startsWith("batch_id=")).map(_.getName).toSet
      assert(edgeParts === Set("batch_id=-1", "batch_id=2"), edgeParts)

      val preFps = rows(spark.table("graft_rec_corpus_fps").drop("batch_id"))
      graft.jobs.MaintenanceJob.run(spark, Seq("compact-corpus",
        "graft_rec_corpus_fps", s"$base/corpus/fps", "doc_id", "8"))
      assert(rows(spark.table("graft_rec_corpus_fps").drop("batch_id")) === preFps)
      graft.jobs.MaintenanceJob.run(spark, Seq("compact-corpus",
        "graft_rec_corpus_bands", s"$base/corpus/bandblocks", "key", "8"))

      // and the stream keeps running against the compacted corpus even after
      // a fresh-JVM restart (simulated: the in-memory catalog forgets both
      // tables — hasCorpus must rebuild the entries from the on-disk layout,
      // not score against a falsely empty corpus): a 4th batch with another
      // exact dup still links to the folded history
      spark.sql("DROP TABLE graft_rec_corpus_bands")
      spark.sql("DROP TABLE graft_rec_corpus_fps")
      landBatch(Seq(4L -> txt).toDF("doc_id", "text"), in, 3)
      val q3 = stream(base, Some("graft_rec_corpus"), _ => ())
      try q3.processAllAvailable() finally q3.stop()
      val afterEdges = EdgeLog.read(spark, s"$base/edges")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(afterEdges.contains((1L, 4L)) && afterEdges.contains((3L, 4L)),
        s"post-compaction batch failed to link: $afterEdges")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_rec_corpus_bands")
      spark.sql("DROP TABLE IF EXISTS graft_rec_corpus_fps")
    }
  }

  test("cross-JVM compaction under a live catalog entry is reconciled, not read stale") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-rec4").toString + "/t"
    val t = "graft_rec4_t"
    try {
      graft.io.Tables.writeBatchBucketed(
        Seq((1L, "a"), (2L, "b")).toDF("doc_id", "v"), t, path, "doc_id", 8, 0L)
      graft.io.Tables.writeBatchBucketed(
        Seq((3L, "c")).toDF("doc_id", "v"), t, path, "doc_id", 8, 1L)
      graft.io.Tables.writeBatchBucketed(
        Seq((4L, "d")).toDF("doc_id", "v"), t, path, "doc_id", 8, 2L)

      // simulate `MaintenanceJob compact-corpus` running in a DIFFERENT JVM
      // while this driver idles between stream restarts: the keep-newest
      // fold lands purely ON DISK (batches 0+1 -> batch_id=-1, their dirs
      // deleted) and THIS JVM's in-memory catalog keeps the stale partition
      // list {0,1,2}. File moves replicate the fold's directory outcome;
      // bucket-tagged file names are unique per write, so plain moves are
      // collision-free and the bucket scan still groups them by tag.
      val root = new java.io.File(path)
      val fold = new java.io.File(root, "batch_id=-1"); fold.mkdirs()
      for (b <- Seq(0, 1)) {
        val d = new java.io.File(root, s"batch_id=$b")
        d.listFiles().foreach { f =>
          if (f.getName.endsWith(".parquet"))
            Files.move(f.toPath, new java.io.File(fold, f.getName).toPath)
          else f.delete()
        }
        assert(d.delete(), s"could not remove $d")
      }
      // the real compaction records WHICH partitions it absorbed (ADVICE r5
      // fold provenance); the simulation must too or the gate refuses it
      Files.write(new java.io.File(fold, "_folded_ids").toPath,
        "batch_id=0\nbatch_id=1".getBytes("UTF-8"))

      // the per-batch gate must re-sync partition metadata with disk; the
      // accumulated-corpus read (batch_id < current) must then see the full
      // folded history instead of resolving deleted dirs
      assert(graft.io.Tables.ensureBatchTable(spark, t, path, "doc_id", 8))
      val all = spark.table(t).where(col("batch_id") < 3L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(all === Set(1L, 2L, 3L, 4L), s"stale catalog hid the corpus: $all")
      val parts = spark.sql(s"SHOW PARTITIONS $t")
        .collect().map(_.getString(0)).toSet
      assert(parts === Set("batch_id=-1", "batch_id=2"), parts)

      // external deletion of a REAL batch partition while the fold dir (and
      // its provenance marker) remain must FAIL-STOP: batch_id=2 was never
      // absorbed by any fold, so adopting its loss would silently truncate
      // the corpus (ADVICE r5 — the hole the provenance marker closes: a
      // bare "-1 exists" check would have synced this loss away)
      graft.io.LocalFs.deleteTree(java.nio.file.Paths.get(path, "batch_id=2"))
      val refusedReal = intercept[IllegalArgumentException] {
        graft.io.Tables.ensureBatchTable(spark, t, path, "doc_id", 8)
      }
      assert(refusedReal.getMessage.contains("without a compaction fold"),
        refusedReal.getMessage)

      // restore batch 2 (replay-idempotent partition overwrite), then:
      // partition loss WITHOUT the fold marker (here: the -1 dir itself
      // vanishes, taking the provenance record with it — a partial wipe,
      // not a compaction outcome) must FAIL-STOP, not be adopted
      graft.io.Tables.writeBatchBucketed(
        Seq((4L, "d")).toDF("doc_id", "v"), t, path, "doc_id", 8, 2L)
      graft.io.LocalFs.deleteTree(java.nio.file.Paths.get(path, "batch_id=-1"))
      val refused = intercept[IllegalArgumentException] {
        graft.io.Tables.ensureBatchTable(spark, t, path, "doc_id", 8)
      }
      assert(refused.getMessage.contains("without a compaction fold"), refused.getMessage)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("catalog loss (fresh-JVM restart) neither destroys nor hides the corpus") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-rec3").toString + "/t"
    val t = "graft_rec3_t"
    try {
      // batches 0 and 1 through the per-batch writer
      graft.io.Tables.writeBatchBucketed(
        Seq((1L, "a"), (2L, "b")).toDF("doc_id", "v"), t, path, "doc_id", 8, 0L)
      graft.io.Tables.writeBatchBucketed(
        Seq((3L, "c")).toDF("doc_id", "v"), t, path, "doc_id", 8, 1L)

      // a restarted stream reads with batch_id < current: the filter must
      // prune at the partition level — files of batch 1 are never opened
      val readFiles = spark.table(t).where(col("batch_id") < 1L)
        .select(input_file_name()).distinct().collect().map(_.getString(0))
      assert(readFiles.nonEmpty && readFiles.forall(_.contains("batch_id=0")),
        s"batch_id<1 read opened non-batch-0 files: ${readFiles.mkString(",")}")

      // simulate a fresh JVM: the in-memory catalog forgets the table while
      // the data survives on disk (external table — DROP is metadata-only)
      spark.sql(s"DROP TABLE $t")
      // the write path must RECOVER the entry and append batch 2, not wipe
      // the path and recreate it with only the new batch
      graft.io.Tables.writeBatchBucketed(
        Seq((4L, "d")).toDF("doc_id", "v"), t, path, "doc_id", 8, 2L)
      val all = spark.table(t).select("doc_id").collect().map(_.getLong(0)).toSet
      assert(all === Set(1L, 2L, 3L, 4L), s"history lost after catalog loss: $all")

      // and a replay of batch 2 after the recovery still overwrites, not appends
      graft.io.Tables.writeBatchBucketed(
        Seq((4L, "d")).toDF("doc_id", "v"), t, path, "doc_id", 8, 2L)
      assert(spark.table(t).count() === 4L)

      // read-path recovery: ensureBatchTable rebuilds a dropped entry (true)
      // but reports a genuinely absent table as such (false, nothing created)
      spark.sql(s"DROP TABLE $t")
      assert(graft.io.Tables.ensureBatchTable(spark, t, path, "doc_id", 8))
      assert(spark.table(t).count() === 4L)
      assert(!graft.io.Tables.ensureBatchTable(
        spark, t + "_absent", path + "_absent", "doc_id", 8))
      assert(!spark.catalog.tableExists(t + "_absent"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
