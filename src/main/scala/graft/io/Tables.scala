package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-layout storage for the offline sandbox (SURVEY.md §7.4): snapshot
  * manifests over partitioned Parquet with append/overwrite and
  * time-travel-by-snapshot-id. The real `spark.read.format("iceberg")` binding
  * is one implementation away (no Iceberg jars ship in /opt/spark/jars —
  * verified); the engine's sinks speak this trait so swapping in Iceberg later
  * is a constructor change, not a pipeline change.
  */
trait IcebergLikeTable {
  def append(df: DataFrame): Long
  def overwrite(df: DataFrame): Long
  def read(spark: SparkSession): DataFrame
  def readSnapshot(spark: SparkSession, snapshotId: Long): DataFrame
  def currentSnapshot: Option[Long]
}

/** Directory layout:
  *   root/data/s<k>/part-*.parquet     (one sub-dir per snapshot's new files)
  *   root/snapshots/v<k>.json          ({"snapshot":k,"dirs":[...],"op":"append"})
  *   root/CURRENT                      (latest k; atomically replaced)
  */
class PartitionedParquetTable(val root: String) extends IcebergLikeTable {
  private def rootP: Path = Paths.get(root)
  private def currentP: Path = rootP.resolve("CURRENT")

  def currentSnapshot: Option[Long] =
    if (Files.exists(currentP)) Some(Files.readString(currentP).trim.toLong) else None

  private def snapshotDirs(k: Long): Seq[String] = {
    val j = Files.readString(rootP.resolve(s"snapshots/v$k.json"))
    // dirs are stored as a JSON array of strings on one line
    "\"data/[^\"]+\"".r.findAllIn(j).map(_.stripPrefix("\"").stripSuffix("\"")).toSeq
  }

  private def commit(df: DataFrame, op: String): Long = {
    val k = currentSnapshot.getOrElse(0L) + 1
    val dataDir = s"data/s$k"
    df.write.mode("overwrite").parquet(s"$root/$dataDir")
    val dirs =
      if (op == "append") currentSnapshot.map(snapshotDirs).getOrElse(Nil) :+ dataDir
      else Seq(dataDir)
    Files.createDirectories(rootP.resolve("snapshots"))
    val manifest =
      s"""{"snapshot":$k,"op":"$op","ts":${System.currentTimeMillis()},""" +
        s""""dirs":[${dirs.map(d => "\"" + d + "\"").mkString(",")}]}"""
    Files.writeString(rootP.resolve(s"snapshots/v$k.json"), manifest)
    // atomic pointer swap = the commit (Iceberg's metadata-pointer semantics)
    val tmp = rootP.resolve("CURRENT.tmp")
    Files.writeString(tmp, k.toString)
    Files.move(tmp, currentP, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    k
  }

  def append(df: DataFrame): Long = commit(df, "append")
  def overwrite(df: DataFrame): Long = commit(df, "overwrite")

  def read(spark: SparkSession): DataFrame =
    readSnapshot(spark, currentSnapshot.getOrElse(
      throw new IllegalStateException(s"empty table $root")))

  def readSnapshot(spark: SparkSession, snapshotId: Long): DataFrame = {
    val dirs = snapshotDirs(snapshotId).map(d => s"$root/$d")
    spark.read.parquet(dirs: _*)
  }
}

/** Bucketed-table helpers (SURVEY.md §4 / builder mandate "bucketing for
  * co-located joins"): records written `bucketBy(doc_id)` join pair ids (or
  * each other) WITHOUT a shuffle on the bucketed side — at 100 TB the
  * pre-bucketed corpus turns every per-round scoring join from
  * corpus-shuffle + join into scan + join. BucketedJoinSpec asserts the
  * exchange really disappears from the physical plan.
  */
object Tables {

  /** Write as a bucketed external table (path-backed, so nothing lands in the
    * session warehouse); sorted within buckets for merge-friendly reads.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      bucketCol: String,
      nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}

/** Checkpoint manifest for mid-pipeline resume (BASELINE north_rule
  * "resumable from checkpoint"): completed stages recorded as
  * `name<TAB>path<TAB>rows` lines, appended atomically after each stage's
  * parquet lands. A rerun with the same outDir skips completed stages by
  * reading their parquet.
  */
class StageManifest(outDir: String) {
  private val p = Paths.get(outDir, "_graft_manifest.tsv")

  def completed: Map[String, String] =
    if (!Files.exists(p)) Map.empty
    else Files.readAllLines(p, StandardCharsets.UTF_8).asScala
      .filter(_.nonEmpty).map { l => val a = l.split('\t'); a(0) -> a(1) }.toMap

  def record(stage: String, path: String, rows: Long): Unit = {
    Files.createDirectories(p.getParent)
    val line = s"$stage\t$path\t$rows\n"
    Files.writeString(p, line, StandardCharsets.UTF_8,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }

  /** Run-or-resume one stage: compute + persist once, then always serve from
    * parquet (also truncates lineage at every stage boundary).
    */
  def stage(spark: SparkSession, name: String)(compute: => DataFrame): DataFrame = {
    val path = s"$outDir/$name"
    completed.get(name) match {
      case Some(existing) => spark.read.parquet(existing)
      case None =>
        val df = compute
        df.write.mode("overwrite").parquet(path)
        val rows = spark.read.parquet(path).count()
        record(name, path, rows)
        spark.read.parquet(path)
    }
  }
}
