package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Bucketing for co-located joins (builder mandate; SURVEY.md §4): a join of
  * two tables bucketed on the join key must run with ZERO shuffle exchanges —
  * the physical proof that a pre-bucketed 100 TB corpus joins without moving.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of two doc_id-bucketed tables has no ShuffleExchange and is exact") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-buckets").toString
    val records = (1 to 4000).map(i => (f"d$i%05d", s"name$i")).toDF("doc_id", "name")
    val scores = (1 to 4000).map(i => (f"d$i%05d", i * 0.001)).toDF("doc_id", "score")
    Tables.writeBucketed(records, "graft_rec_b", s"$base/rec", "doc_id", 8)
    Tables.writeBucketed(scores, "graft_sco_b", s"$base/sco", "doc_id", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val joined = spark.table("graft_rec_b").join(spark.table("graft_sco_b"), "doc_id")
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"bucketed join should be exchange-free, found: ${shuffles.map(_.nodeName)}")
      assert(joined.count() === 4000)
      val r = joined.where($"doc_id" === "d00042").collect()(0)
      assert(r.getAs[String]("name") === "name42" && r.getAs[Double]("score") === 0.042)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_rec_b")
      spark.sql("DROP TABLE IF EXISTS graft_sco_b")
    }
  }

  test("compactBucketed: appended small files collapse to one per bucket, joins stay exchange-free") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-compact").toString
    val path = s"$base/rec"
    def batch(lo: Int, hi: Int) = (lo to hi).map(i => (f"d$i%05d", s"name$i")).toDF("doc_id", "name")
    // simulate a stream: 3 bucketed appends -> ≥3 files per bucket
    batch(1, 1000).write.mode("append").bucketBy(4, "doc_id").sortBy("doc_id")
      .option("path", path).format("parquet").saveAsTable("graft_cmp_b")
    for ((lo, hi) <- Seq((1001, 2000), (2001, 3000)))
      batch(lo, hi).write.mode("append").bucketBy(4, "doc_id").sortBy("doc_id")
        .option("path", path).format("parquet").saveAsTable("graft_cmp_b")
    def dataFiles = new java.io.File(path).listFiles().count(_.getName.startsWith("part-"))
    val before = dataFiles
    assert(before >= 12, s"expected ≥3 files x 4 buckets before compaction, got $before")
    try {
      Tables.compactBucketed(spark, "graft_cmp_b", path, "doc_id", 4)
      assert(dataFiles === 4, s"one file per bucket after compaction, got $dataFiles")
      assert(spark.table("graft_cmp_b").count() === 3000)
      // the re-registered table still joins exchange-free on the bucket key
      Tables.writeBucketed(
        (1 to 3000).map(i => (f"d$i%05d", i * 0.001)).toDF("doc_id", "score"),
        "graft_cmp_s", s"$base/sco", "doc_id", 4)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("graft_cmp_b").join(spark.table("graft_cmp_s"), "doc_id")
        val shuffles = joined.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e
        }
        assert(shuffles.isEmpty, shuffles.map(_.nodeName).toString)
        assert(joined.count() === 3000)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      // and the stream can keep appending to the re-created table
      batch(3001, 3100).write.mode("append").bucketBy(4, "doc_id").sortBy("doc_id")
        .option("path", path).format("parquet").saveAsTable("graft_cmp_b")
      spark.catalog.refreshTable("graft_cmp_b")
      assert(spark.table("graft_cmp_b").count() === 3100)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_cmp_b")
      spark.sql("DROP TABLE IF EXISTS graft_cmp_s")
      spark.sql("DROP TABLE IF EXISTS graft_cmp_b_compact_tmp")
    }
  }

  test("partitionBy write + predicate reads only the matching partition (pruning)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-partitions").toString + "/docs"
    (1 to 3000).map(i => (f"d$i%05d", s"lang${i % 5}", s"text $i"))
      .toDF("doc_id", "lang", "text")
      .write.partitionBy("lang").parquet(dir)
    val q = spark.read.parquet(dir).where($"lang" === "lang3")
    // physical proof: the scan carries a partition filter...
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang3"), plan.take(800))
    // ...and only lang=lang3 files are actually read
    val filesRead = q.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(filesRead.nonEmpty && filesRead.forall(_.contains("lang=lang3")), filesRead.take(3).toSeq)
    assert(q.count() === 600)
  }
}
