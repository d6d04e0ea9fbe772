package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.io.{PartitionedParquetTable, StageManifest}
import graft.jobs.LinkJob
import graft.model.MatchConfig
import graft.pipeline.Fixtures

/** Checkpoint/resume semantics (BASELINE north_rule "resumable from checkpoint
  * with per-partition lineage + metrics"): a killed run resumed mid-pipeline
  * must equal a clean run; the Iceberg-layout table must support append /
  * overwrite / time-travel by snapshot id.
  */
class ResumeSpec extends SparkSpec {

  private def tmpDir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  private def clusterMap(dir: String): Map[String, String] =
    spark.read.parquet(s"$dir/clusters").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  test("empty corpus: LinkJob completes with zero counts") {
    val s = LinkJob.run(spark, Fixtures.docs(spark, 0), MatchConfig.fixture,
      tmpDir("graft-link-empty").toString)
    assert(s.docs === 0 && s.records === 0 && s.pairs === 0)
    assert(s.matches === 0 && s.clusters === 0)
  }

  test("LinkJob end-to-end: counts, lineage, metrics, clusters") {
    val out = tmpDir("graft-link").toString
    val docs = Fixtures.docs(spark, 250)
    val s = LinkJob.run(spark, docs, MatchConfig.fixture, out)
    assert(s.docs > 250 && s.records === s.docs)
    assert(s.pairs > 0 && s.matches > 0)
    assert(s.clusters > 0 && s.clusters < s.docs)
    // lineage rows exist for every stage
    val lineage = spark.read.parquet(s"$out/lineage")
    val stages = lineage.select("stage").distinct().collect().map(_.getString(0)).toSet
    assert(stages === Set("records", "blocks", "pairs", "scored", "classified", "edges", "clusters"))
    // lineage row counts reconcile with the manifest's stage totals
    val manifest = new StageManifest(out)
    assert(manifest.completed.keySet.contains("clusters"))
    val recRows = lineage.where(col("stage") === "records")
      .agg(sum("rows")).collect()(0).getLong(0)
    assert(recRows === s.records)
    // lineage is writer-side provenance: one row per part FILE actually
    // written for the stage (each writer task emits one file)
    val recFiles = new java.io.File(s"$out/records").listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    val recLineageRows = lineage.where(col("stage") === "records").count()
    assert(recLineageRows === recFiles,
      s"lineage rows ($recLineageRows) != written part files ($recFiles)")
    // metrics persisted
    val metrics = spark.read.parquet(s"$out/metrics").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(metrics(("job", "pairs")) === s.pairs.toDouble)
  }

  test("lookup-flagged config drives production blocking in LinkJob") {
    import graft.model.PropertySpec
    val out = tmpDir("graft-lookup").toString
    val docs = Fixtures.docs(spark, 250)
    // flag phone as the only lookup property: every blocking key must be its
    // exact cleaned value (fromConfig's "<prop>:" prefix), and the pipeline
    // still finds matches through it
    val cfg = MatchConfig.fixture.copy(properties =
      MatchConfig.fixture.properties.map(p =>
        if (p.name == "phone") p.copy(lookup = "required") else p))
    val s = LinkJob.run(spark, docs, cfg, out)
    val keys = spark.read.parquet(s"$out/blocks")
      .select("key").distinct().collect().map(_.getString(0))
    assert(keys.nonEmpty && keys.forall(_.startsWith("phone:")))
    assert(s.pairs > 0 && s.matches > 0)

    // unflagged config keeps the default scheme (soundex + phone digits) —
    // summary equals a run with the explicit default keyers
    val outDefault = tmpDir("graft-default").toString
    val sDefault = LinkJob.run(spark, docs, MatchConfig.fixture, outDefault)
    val defKeys = spark.read.parquet(s"$outDefault/blocks")
      .select("key").distinct().collect().map(_.getString(0))
    assert(defKeys.exists(_.startsWith("n:")) && defKeys.exists(_.startsWith("p:")))
    assert(sDefault.matches > 0)
  }

  test("resume mid-pipeline reproduces the clean run exactly") {
    val cleanOut = tmpDir("graft-clean").toString
    val resumeOut = tmpDir("graft-resume").toString
    val docs = Fixtures.docs(spark, 250)

    val cleanSummary = LinkJob.run(spark, docs, MatchConfig.fixture, cleanOut)

    // simulate a killed run: run fully, then strip the manifest + outputs back
    // to the first three stages (records/blocks/pairs) — as if the crash hit
    // during scoring — and resume.
    LinkJob.run(spark, docs, MatchConfig.fixture, resumeOut)
    val manifestPath = java.nio.file.Paths.get(resumeOut, "_graft_manifest.tsv")
    val keep = Set("records", "blocks", "pairs")
    val lines = Files.readAllLines(manifestPath)
    val kept = new java.util.ArrayList[String]()
    lines.forEach { l => if (keep.contains(l.split('\t')(0))) kept.add(l) }
    Files.write(manifestPath, kept)
    // delete downstream stage outputs so resume must recompute them
    new java.io.File(resumeOut).listFiles().foreach { f =>
      if (f.isDirectory && !keep.contains(f.getName)) {
        def rm(x: java.io.File): Unit = {
          if (x.isDirectory) x.listFiles().foreach(rm)
          x.delete()
        }
        rm(f)
      }
    }

    val resumedSummary = LinkJob.run(spark, docs, MatchConfig.fixture, resumeOut)
    assert(resumedSummary === cleanSummary)
    assert(clusterMap(resumeOut) === clusterMap(cleanOut))
  }

  test("a second run over a completed outDir is a pure no-op read") {
    val out = tmpDir("graft-noop").toString
    val docs = Fixtures.docs(spark, 120)
    val s1 = LinkJob.run(spark, docs, MatchConfig.fixture, out)
    val mtimeBefore = java.nio.file.Paths.get(out, "_graft_manifest.tsv").toFile.lastModified()
    val s2 = LinkJob.run(spark, docs, MatchConfig.fixture, out)
    assert(s1 === s2)
    val mtimeAfter = java.nio.file.Paths.get(out, "_graft_manifest.tsv").toFile.lastModified()
    assert(mtimeBefore === mtimeAfter) // no stage recomputed or re-recorded
  }

  test("IcebergLikeTable: append, overwrite, time-travel by snapshot id") {
    import spark.implicits._
    val root = tmpDir("graft-tbl").toString
    val tbl = new PartitionedParquetTable(root)
    assert(tbl.currentSnapshot === None)

    val s1 = tbl.append(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    val s2 = tbl.append(Seq((3, "c")).toDF("id", "v"))
    assert(tbl.read(spark).count() === 3)
    assert(tbl.readSnapshot(spark, s1).count() === 2)

    val s3 = tbl.overwrite(Seq((9, "z")).toDF("id", "v"))
    assert(tbl.currentSnapshot === Some(s3))
    assert(tbl.read(spark).collect().map(r => (r.getInt(0), r.getString(1))).toSet === Set((9, "z")))
    // time travel still sees the pre-overwrite snapshots
    assert(tbl.readSnapshot(spark, s2).count() === 3)
    assert(tbl.readSnapshot(spark, s1).count() === 2)
  }
}
