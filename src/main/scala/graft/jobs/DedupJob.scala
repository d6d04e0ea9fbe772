package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.TrainingOps
import graft.io.StageManifest
import graft.pipeline.{BandedPairs, Cluster}

/** End-to-end near-duplicate deduplication over a `documents(doc_id, text)`
  * corpus — the training-data-pipeline counterpart of `LinkJob` (builder
  * mandate: dedup as a first-class component), stitched from the library's
  * own operators so every stage keeps its proven scale shape:
  *
  *   text -> shingle fingerprints (codegen kernel, one char pass per doc)
  *        -> EXACT pre-pass: identical fingerprint sets group linearly
  *           (identical docs are duplicates BY CONSTRUCTION — Jaccard 1 —
  *           so they never enter the pair space; 10⁶ copies of one
  *           boilerplate page cost one groupBy row, not 5·10¹¹ pairs, and
  *           can never be lost to a block-size cap)
  *        -> MinHash band keys over group REPRESENTATIVES only
  *           (TrainingOps.minhashBandSpark, shared with the oracle-checked
  *           `q_lsh_near_dup_pairs`)
  *        -> candidate rep pairs (BandedPairs: salted/capped band buckets —
  *           hot buckets of DISTINCT docs cannot go quadratic; dropped mass
  *           is REPORTED in metrics, never silent)
  *        -> exact shingle-Jaccard verify at `jaccardMinMicro`
  *        -> large-star/small-star connected components over rep edges
  *           (transitive: A≈B≈C collapses even when A,C never pair)
  *        -> keep/drop decisions: every doc's cluster = its representative's
  *           component; keep = cluster minimum (which IS the smallest doc_id
  *           in the cluster: rep = min of its exact group, CC label = min
  *           rep).
  *
  * Every stage lands as parquet under `outDir` via the same StageManifest as
  * LinkJob, so a killed run resumes mid-pipeline and a completed outDir is a
  * pure no-op read (north rule: resumable, lineage'd, metric'd).
  */
object DedupJob {

  case class Summary(
      docs: Long, exactGroups: Long, candidates: Long, edges: Long,
      clusters: Long, kept: Long, dropped: Long, droppedPairsMass: Double)

  def run(
      spark: SparkSession,
      documents: DataFrame, // (doc_id: bigint, text: string, ...)
      outDir: String,
      cfg: TrainingOps.Config = TrainingOps.config): Summary = {
    import spark.implicits._
    val m = new StageManifest(outDir)
    val metrics = scala.collection.mutable.ArrayBuffer[(String, String, Double)]()

    // ① shingle fingerprints (one kernel pass) + exact-group representative:
    //    identical fp sequences share a group; rep = min doc_id. The window
    //    keys on md5 of the fp sequence, NOT the concatenated string — the
    //    shuffle then carries fps + 16 bytes instead of fps + an equally
    //    large key per row (at corpus scale the key would double the
    //    exchange). A 128-bit collision wrongly merging two groups needs
    //    ~2⁻¹²⁸ per pair — ~10⁻¹⁵ cumulative even at 10¹² docs.
    val grouped = m.stage(spark, "grouped") {
      val fps = TrainingOps.shingleFps(documents.select($"doc_id", $"text"))
      val withRep = fps.withColumn("rep",
        min($"doc_id").over(Window.partitionBy(md5(concat_ws(",", $"fps")))))
      // ② band keys ride along on REPRESENTATIVE rows in the same pass: the
      // old separate "banded" stage re-wrote every rep's fps array plus its
      // bands to parquet and cost one more write+count action — both bands
      // and rep flags are narrow projections of this very scan (VERDICT r3
      // #8: manifest stages are serial fixed cost at any corpus size)
      withRep.select(Seq($"doc_id", $"fps", $"rep") ++
        (0 until cfg.minhashBands).map(j => expr(
          s"CASE WHEN doc_id = rep THEN ${TrainingOps.minhashBandSpark(j)} END")
          .as(s"band$j")): _*)
    }
    val banded =
      if (grouped.columns.contains("band0")) grouped.where($"doc_id" === $"rep")
      else m.stage(spark, "banded") {
        // resume of an outDir written BEFORE the band-fold: its `grouped`
        // parquet has no band columns, so serve/compute the legacy separate
        // banded stage — a mid-upgrade kill must still resume, not crash
        grouped.where($"doc_id" === $"rep")
          .selectExpr(Seq("doc_id", "fps") ++
            (0 until cfg.minhashBands).map(j =>
              s"${TrainingOps.minhashBandSpark(j)} AS band$j"): _*)
      }

    // ③ candidate rep pairs through the skew discipline (stats -> metrics)
    val candDf = m.stage(spark, "candidates") {
      val items = banded.selectExpr("doc_id AS id",
        s"array(${(0 until cfg.minhashBands).map(j => s"band$j").mkString(",")}) AS bands")
      val (pairs, st) = BandedPairs.candidates(items, cfg.pairCfg)
      metrics += (("candidates", "dropped_pairs_mass", st.droppedPairsMass))
      metrics += (("candidates", "salted_blocks", st.saltedBlocks.toDouble))
      pairs
    }
    val statsMass = metrics.collectFirst {
      case ("candidates", "dropped_pairs_mass", v) => v
    }.getOrElse(0.0) // 0.0 on resume: stage served from parquet, stats not rerun

    // ④ verify candidates with exact shingle-set Jaccard (arrays re-attach
    //    only to surviving candidate ids — never shuffled during generation)
    val edges = m.stage(spark, "edges") {
      val fps = banded.select($"doc_id", $"fps")
      candDf
        .join(fps.select($"doc_id".as("a_id"), $"fps".as("fa")), "a_id")
        .join(fps.select($"doc_id".as("b_id"), $"fps".as("fb")), "b_id")
        .withColumn("inter", size(array_intersect($"fa", $"fb")).cast("long"))
        .withColumn("jacc_micro", expr(
          "CAST(FLOOR(CAST(inter AS DOUBLE) / (size(fa) + size(fb) - inter) * 1e6 + 0.5) AS BIGINT)"))
        .where($"jacc_micro" >= cfg.jaccardMinMicro)
        .select($"a_id", $"b_id", $"jacc_micro")
    }

    // ⑤ transitive dup clusters over reps, expanded to every doc through its
    //    exact group; keep = the cluster's minimum doc_id (= the CC label)
    val decisions = m.stage(spark, "decisions") {
      val labeled = Cluster.connectedComponents(edges.select($"a_id", $"b_id"))
        .select($"doc_id".cast("long").as("rep"), $"cluster_id".cast("long").as("cc"))
      grouped.select($"doc_id", $"rep")
        .join(labeled, Seq("rep"), "left")
        .select($"doc_id",
          coalesce($"cc", $"rep").as("cluster_id"),
          ($"doc_id" === coalesce($"cc", $"rep")).as("keep"))
    }

    // summary metrics in TWO actions: docs/candidates/edges counts come from
    // the manifest rows recorded when each stage landed (no re-count jobs),
    // leaving one agg over `grouped` (exact groups) and one over `decisions`
    // (kept/dropped/clusters) — at bench scale the driver-side action count
    // is a fixed serial cost that caps scaling efficiency
    val stageRows = m.completedRows
    val nGroups = grouped
      .agg(count(when($"doc_id" === $"rep", 1))).collect()(0).getLong(0)
    val d = decisions
      .agg(count(when($"keep", 1)), count(when(!$"keep", 1)),
        countDistinct($"cluster_id")).collect()(0)
    val (nKept, nDropped, nClusters) = (d.getLong(0), d.getLong(1), d.getLong(2))
    val counts = Map(
      "docs" -> stageRows("grouped"),
      "exact_groups" -> nGroups,
      "candidates" -> stageRows("candidates"),
      "edges" -> stageRows("edges"),
      "clusters" -> nClusters,
      "kept" -> nKept,
      "dropped" -> nDropped)
    counts.foreach { case (k, v) => metrics += (("job", k, v.toDouble)) }
    m.stage(spark, "metrics") { metrics.toSeq.toDF("stage", "metric", "value") }

    Summary(
      docs = counts("docs"), exactGroups = counts("exact_groups"),
      candidates = counts("candidates"), edges = counts("edges"),
      clusters = counts("clusters"), kept = counts("kept"),
      dropped = counts("dropped"), droppedPairsMass = statsMass)
  }

  /** spark-submit entry: DedupJob <documentsParquet> <outDir> */
  def main(args: Array[String]): Unit = {
    val docsPath = args.headOption.getOrElse("/root/testdata/sf0.01/documents.parquet")
    val outDir = args.lift(1).getOrElse("/tmp/graft-dedup")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .appName("graft-dedup")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = run(spark, spark.read.parquet(docsPath), outDir)
    println(s"[dedup] $s")
    spark.stop()
  }
}
