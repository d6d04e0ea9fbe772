package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import graft.model.{Doc, MatchConfig}
import graft.pipeline.ErPipeline

/** Structured-Streaming re-expression of the reference's incremental behavior
  * (SURVEY.md §2.9): ES scores at query time — index a doc, the next query sees
  * it; Duke's incremental dedup is repeated `Processor.deduplicate(batch)`
  * against a growing Database. Here:
  *
  *  - `dedupStream`: stateful exact-dedup keyed on content fingerprint via
  *    `flatMapGroupsWithState` (first-seen vs duplicate decisions, the
  *    KeyValueGroupedDataset custom-state path);
  *  - `linkStream`: micro-batch incremental record linkage via `foreachBatch` —
  *    each batch extracts + blocks the new docs, scores them against the
  *    accumulated corpus (new-vs-all + new-vs-new), and appends match edges;
  *    the corpus itself grows by the batch (Duke's Database.index analog).
  */
/** Per-micro-batch metrics row, shared by both streaming jobs (the streaming
  * twin of the batch jobs' metrics stage). Each batch OVERWRITES its own
  * `batch_id=<k>` partition dir, so foreachBatch's at-least-once replay
  * rewrites the same row instead of appending a duplicate — the same
  * idempotence discipline as `LabelCommit`. Read the parent dir to get
  * (docs, edges, ts, batch_id) with batch_id inferred from the layout.
  * One tiny dir per batch is the floor for per-batch observability; the
  * growth is on the METRICS read path only (never the hot path), and a
  * long-lived stream can aggregate old rows offline if the listing ever
  * matters.
  */
private[streaming] object BatchMetrics {
  def write(spark: SparkSession, dir: String, batchId: Long,
      docs: Long, edges: Long): Unit = {
    import spark.implicits._
    Seq((docs, edges, System.currentTimeMillis()))
      .toDF("docs", "edges", "ts")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/batch_id=$batchId")
  }
}

/** Per-micro-batch incremental cluster-label maintenance, shared by
  * `IncrementalLink.linkStream` (match-edge clusters) and
  * `IncrementalDedup.nearDupStream` (near-dup clusters): fold one batch's
  * edges into the standing (doc_id, cluster_id) labeling via
  * `Cluster.mergeDelta` and commit through a `HashPartitionedTable`
  * partitioned on `hash(cluster_id)` — the write is O(affected clusters),
  * never O(corpus), while every batch lands as an atomic, time-travelable
  * snapshot (VERDICT r3 #2). Labels stay equal to a full CC over all edges
  * so far, with edge-free docs as their own singleton clusters.
  */
private[streaming] object LabelCommit {

  /** @param batchEdges (a_id, b_id) match edges, pinned by the caller
    * @param newDocIds  one `doc_id` column: every doc in this batch
    * @param keepSnapshots when set, expire label snapshots to the newest N
    */
  def commit(
      spark: SparkSession,
      dir: String,
      nBuckets: Int,
      batchEdges: DataFrame,
      newDocIds: DataFrame,
      keepSnapshots: Option[Int]): Unit = {
    val tbl = new graft.io.HashPartitionedTable(dir, "cluster_id", nBuckets)
    tbl.currentSnapshot match {
      case None =>
        // first batch: full labeling = CC over the batch's edges, plus this
        // batch's edge-free docs as their own singleton clusters
        val labeled = graft.pipeline.Cluster.connectedComponents(batchEdges)
          .select(col("doc_id"), col("cluster_id"))
        val singles = newDocIds.select(col("doc_id"))
          .join(labeled.select(col("doc_id")), Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("doc_id").as("cluster_id"))
        tbl.overwrite(labeled.unionByName(singles))
      case Some(_) =>
        val labels = tbl.read(spark)
        val delta = graft.pipeline.Cluster.mergeDelta(labels, batchEdges)
        val relabel = graft.io.Persist.truncate(delta.relabel)
        val added = graft.io.Persist.truncate(delta.added)
        // edge-free new docs enter as singletons labeled by their own id.
        // The anti-join runs against the LABELS, not the corpus table: the
        // labels are committed last in the batch, so they are a superset of
        // every other per-batch artifact under foreachBatch's at-least-once
        // replay — a replayed doc is already labeled (possibly in ANOTHER
        // cluster's partition, invisible to an affected-partition check) and
        // must not re-enter as a singleton (LabelCommitSpec). One extra scan
        // of the labels per batch, on top of mergeDelta's endpoint lookup;
        // the WRITE stays O(affected partitions).
        val singles = graft.io.Persist.truncate(
          newDocIds.select(col("doc_id"))
            .join(labels.select(col("doc_id")), Seq("doc_id"), "left_anti")
            .join(added.select(col("doc_id")), Seq("doc_id"), "left_anti")
            .select(col("doc_id"), col("doc_id").as("cluster_id")))
        // affected partitions: every relabeled cluster's source and target
        // labels, plus the new docs' own labels — a cluster's members all
        // live in hash(cluster_id)'s partition, so this driver-side set
        // (≤ nBuckets ints) is exact
        val affected = relabel.select(tbl.partitionExpr(col("lab")).as("p"))
          .union(relabel.select(tbl.partitionExpr(col("new_lab")).as("p")))
          .union(added.select(tbl.partitionExpr(col("cluster_id")).as("p")))
          .union(singles.select(tbl.partitionExpr(col("cluster_id")).as("p")))
          .distinct().collect().map(_.getInt(0)).toSet
        if (affected.nonEmpty) {
          val updated = tbl.readPartitions(spark, affected)
            .withColumnRenamed("cluster_id", "lab")
            .join(relabel, Seq("lab"), "left")
            .select(col("doc_id"),
              coalesce(col("new_lab"), col("lab")).as("cluster_id"))
          tbl.overwritePartitions(
            updated.unionByName(added).unionByName(singles), affected)
        }
    }
    keepSnapshots.foreach(tbl.expireSnapshots)
  }
}

object IncrementalLink {

  case class DedupDecision(doc_id: String, fingerprint: Long, duplicate_of: Option[String])

  /** Content fingerprint of a doc's text spans (same rolling hash as the batch
    * fingerprint op).
    */
  def fingerprint(doc: Doc): Long = {
    var h = 0L
    doc.spans.foreach { s =>
      if (s.text != null) {
        var i = 0
        while (i < s.text.length) { h = (h * 31 + s.text.charAt(i)) % 1000000007L; i += 1 }
        h = (h * 31 + 7) % 1000000007L // span separator
      }
    }
    h
  }

  /** Stateful exact dedup: state = first doc_id seen per fingerprint; later
    * arrivals emit `duplicate_of = Some(first)`.
    *
    * @param idleTimeout when set, fingerprint state idle past this horizon is
    *                    evicted (ProcessingTimeTimeout) so the store is
    *                    bounded by the ACTIVE fingerprint set, not stream
    *                    history — the standard trade for unbounded streams: a
    *                    duplicate arriving after the horizon re-registers as
    *                    first-seen. None (default) keeps exact global dedup.
    */
  def dedupStream(
      docs: Dataset[Doc],
      idleTimeout: Option[scala.concurrent.duration.Duration] = None): Dataset[DedupDecision] = {
    import docs.sparkSession.implicits._
    val timeoutConf = idleTimeout
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout())
      .getOrElse(GroupStateTimeout.NoTimeout())
    docs.map(d => (fingerprint(d), d.doc_id))
      .groupByKey(_._1)
      .flatMapGroupsWithState[String, DedupDecision](
        OutputMode.Append(), timeoutConf) {
        case (fp, rows, state: GroupState[String]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.map(_._2).toSeq.sorted // deterministic within batch
            var first = state.getOption
            val out = sorted.map { id =>
              first match {
                case None =>
                  first = Some(id); state.update(id)
                  DedupDecision(id, fp, None)
                case Some(f) =>
                  DedupDecision(id, fp, Some(f))
              }
            }
            idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
            out.iterator
          }
      }
  }

  /** Watermarked per-window classification counts over a scored stream —
    * the streaming metrics face of P4 (SURVEY.md §2.9: watermark + windowed
    * aggregation). Input needs an event-time column and a `bucket` column
    * (`ErPipeline.classify` output); state is bounded by the watermark: a
    * window finalizes (appends) once event time passes window end + delay,
    * and later-than-watermark rows are dropped, so the state store never
    * grows with stream length.
    */
  def bucketCountsByWindow(
      classified: DataFrame,
      eventTimeCol: String,
      windowDuration: String,
      watermarkDelay: String): DataFrame =
    classified
      .withWatermark(eventTimeCol, watermarkDelay)
      .groupBy(window(col(eventTimeCol), windowDuration), col("bucket"))
      .agg(count("*").as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("bucket"), col("n"))

  /** Incremental linkage: every micro-batch links its docs against the corpus
    * accumulated so far (parquet-backed, the Duke Database analog) and appends
    * edges. Returns the started query; caller owns lifecycle.
    *
    * Scale shape: only the NEW docs are extracted and blocked each batch; a
    * persistent blocks table stands in for the inverted index, so per-batch
    * work is new-vs-new (triangular self-join) + new-vs-corpus (A-vs-B
    * linkPairs against stored blocks) — never a re-block or re-scan of the
    * whole corpus' pair space.
    */
  /** @param clustersDir when set, a complete (doc_id, cluster_id) labeling is
    *                     maintained under this path across micro-batches via
    *                     `Cluster.mergeDelta` — each batch's match edges fold
    *                     into the existing labels at DELTA cost (contracted
    *                     CC over affected clusters only), and the commit
    *                     rewrites ONLY the label partitions holding affected
    *                     clusters (`HashPartitionedTable.overwritePartitions`,
    *                     labels hash-partitioned on cluster_id into
    *                     `nClusterBuckets`) — never the whole labeling. Labels
    *                     equal the batch pipeline's CC over all edges so far
    *                     (BucketedCorpusSpec).
    * @param labelSnapshotsToKeep when set, expire label snapshots after each
    *                     commit keeping the newest N (bounded storage for
    *                     unbounded streams; time travel limited to the
    *                     retained window — shared partition dirs survive as
    *                     long as any retained snapshot references them).
    *                     None (default) keeps every batch's labeling.
    */
  def linkStream(
      stream: Dataset[Doc],
      config: MatchConfig,
      corpusDir: String,
      edgesDir: String,
      checkpointDir: String,
      corpusTable: Option[String] = None,
      nBuckets: Int = 8,
      clustersDir: Option[String] = None,
      nClusterBuckets: Int = 8,
      labelSnapshotsToKeep: Option[Int] = None): StreamingQuery = {
    val spark = stream.sparkSession
    import spark.implicits._

    stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Doc], batchId: Long) =>
        val newRecords = graft.io.Persist.truncate(
          ErPipeline.extract(batch, config).toDF()).as[ErPipeline.CleanRecord]
        if (!newRecords.isEmpty) {
          // blocking scheme = the config's lookup flags, SAME as batch
          // LinkJob stage ② (ADVICE r3: a lookup-flagged config must stream
          // the same candidate set it links in batch)
          val keyers = graft.pipeline.Blocking.fromConfig(config)
          val newBlocks = graft.io.Persist.truncate(
            ErPipeline.block(newRecords, keyers).toDF()).as[ErPipeline.BlockRow]
          val recordsDir = s"$corpusDir/records"
          val blocksDir = s"$corpusDir/blocks"
          val hasCorpus = corpusTable match {
            case Some(tn) => spark.catalog.tableExists(tn)
            case None     => new java.io.File(s"$recordsDir/_SUCCESS").exists()
          }
          // the accumulated corpus records (previous batches only — this
          // batch's append happens below): scoring's b-side. doc_id-bucketed
          // when a table name is configured, so the score join leaves it in
          // place.
          val corpusRecs: Option[Dataset[ErPipeline.CleanRecord]] =
            if (!hasCorpus) None
            else Some((corpusTable match {
              case Some(tn) =>
                // the catalog caches the relation's file listing across
                // micro-batches; without a refresh the read misses the
                // previous batch's append and its pairs silently drop at
                // the inner props join
                spark.catalog.refreshTable(tn)
                spark.table(tn) // doc_id-bucketed: b-join is exchange-free
              case None => spark.read.parquet(recordsDir)
            }).as[ErPipeline.CleanRecord])

          // new-vs-new pairs score against the (small, pinned) batch records;
          // new-vs-old pairs score with the a-side = batch, b-side = corpus —
          // the corpus is only ever the BUILD side of one join, never unioned
          // into the probe (a union would both re-shuffle the corpus each
          // micro-batch and discard its bucketed distribution)
          val (nnPairs, _) = ErPipeline.pairs(newBlocks)
          val scoredNew = ErPipeline.score(nnPairs, newRecords, config)
          val scored = corpusRecs match {
            case None => scoredNew
            case Some(corpus) =>
              val oldBlocks = (corpusTable match {
                case Some(tn) =>
                  // blocks bucketed on key: the per-batch linkPairs groupBy
                  // and key-join read the corpus blocks pre-clustered
                  spark.catalog.refreshTable(tn + "_blocks")
                  spark.table(tn + "_blocks")
                case None => spark.read.parquet(blocksDir)
              }).as[ErPipeline.BlockRow]
              val (noPairs, _) = ErPipeline.linkPairs(newBlocks, oldBlocks)
              scoredNew.unionByName(
                ErPipeline.score(noPairs, newRecords, corpus, config))
          }
          // linkPairs keeps (new, old) orientation; normalize to (min, max)
          // so streamed edges equal the batch pipeline's bit-for-bit
          val batchEdges = graft.io.Persist.truncate(
            ErPipeline.matchEdges(scored, config)
              .select(least(col("a_id"), col("b_id")).as("a_id"),
                greatest(col("a_id"), col("b_id")).as("b_id")))
          batchEdges.write.mode("append").parquet(edgesDir)

          // incremental transitive clusters: fold this batch's edges into the
          // standing labels, rewriting only affected partitions (LabelCommit)
          clustersDir.foreach { dir =>
            LabelCommit.commit(spark, dir, nClusterBuckets, batchEdges,
              newRecords.toDF().select(col("doc_id")), labelSnapshotsToKeep)
          }

          // per-batch metrics beside the corpus (north rule "metric'd");
          // both frames are pinned, so the two counts are cached-block scans
          BatchMetrics.write(spark, s"$corpusDir/metrics", batchId,
            newRecords.toDF().count(), batchEdges.count())
          // grow the corpus + its blocks table (Database.index analog);
          // bucketed-by-doc_id when a table name is configured, so every later
          // batch's score join leaves the accumulated records in place
          corpusTable match {
            case Some(tn) =>
              newRecords.toDF().write.mode("append")
                .bucketBy(nBuckets, "doc_id").sortBy("doc_id")
                .option("path", recordsDir).format("parquet").saveAsTable(tn)
              newBlocks.toDF().write.mode("append")
                .bucketBy(nBuckets, "key").sortBy("key")
                .option("path", blocksDir).format("parquet").saveAsTable(tn + "_blocks")
            case None =>
              newRecords.toDF().write.mode("append").parquet(recordsDir)
              newBlocks.toDF().write.mode("append").parquet(blocksDir)
          }
        }
        ()
      }
      .start()
  }
}
