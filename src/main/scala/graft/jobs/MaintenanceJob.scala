package graft.jobs

import org.apache.spark.sql.SparkSession

import graft.io.{EdgeLog, SnapshotMaintenance, Tables}

/** Operations CLI for the storage-maintenance passes a long-lived stream
  * needs (VERDICT r4 directive 7): small-file compaction for the edge log
  * and corpus tables, snapshot expiry for the label store — without writing
  * Scala. One subcommand per op:
  *
  * {{{
  * MaintenanceJob compact-edges    <edgesDir> [targetFiles=1]
  * MaintenanceJob compact-corpus   <table> <path> <bucketCol> <nBuckets>
  * MaintenanceJob compact-bucketed <table> <path> <bucketCol> <nBuckets>
  * MaintenanceJob expire-snapshots <rootDir> [keepLast=1]
  * }}}
  *
  * `compact-corpus` is for the batch-partitioned bucketed tables the
  * streaming paths write ([[Tables.writeBatchBucketed]] layout);
  * `compact-bucketed` for the plain bucketed tables of batch jobs.
  * `expire-snapshots` works on any snapshot root ([[graft.io.LabelStore]],
  * [[graft.io.PartitionedParquetTable]], `IcebergLikeTable` — same manifest
  * format).
  *
  * ALL compaction subcommands require their writers stopped (documented on
  * each op — readers race the directory swap; real Iceberg's atomic rewrite
  * replaces this once bindable). Crash-safe: every op stages to `_tmp`,
  * keeps the original at `_bak` until the swap lands, and auto-recovers a
  * half-finished previous run at entry.
  */
object MaintenanceJob {

  def run(spark: SparkSession, args: Seq[String]): Unit = args match {
    case Seq("compact-edges", dir) =>
      EdgeLog.compact(spark, dir)
    case Seq("compact-edges", dir, target) =>
      EdgeLog.compact(spark, dir, target.toInt)
    case Seq("compact-corpus", table, path, bucketCol, nBuckets) =>
      Tables.compactBatchBucketed(spark, table, path, bucketCol, nBuckets.toInt)
    case Seq("compact-bucketed", table, path, bucketCol, nBuckets) =>
      Tables.compactBucketed(spark, table, path, bucketCol, nBuckets.toInt)
    case Seq("expire-snapshots", root) =>
      SnapshotMaintenance.expire(root, 1)
    case Seq("expire-snapshots", root, keep) =>
      SnapshotMaintenance.expire(root, keep.toInt)
    case other =>
      throw new IllegalArgumentException(
        s"unknown maintenance command: ${other.mkString(" ")} " +
          "(expected compact-edges | compact-corpus | compact-bucketed | expire-snapshots)")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .appName("graft-maintenance")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args.toSeq)
    finally spark.stop()
    println(s"[maintenance] done: ${args.mkString(" ")}")
  }
}
