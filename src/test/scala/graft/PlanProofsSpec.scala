package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.expr.functions._

/** Physical-plan proofs for the optimizer claims the engine's design leans on
  * (SURVEY.md §4): predicate pushdown reaches the parquet scan, column
  * pruning survives the custom Catalyst expressions, and the similarity
  * expressions stay inside whole-stage codegen (no interpreted fallback on
  * the scoring hot path).
  */
class PlanProofsSpec extends SparkSpec {

  private lazy val wideDir = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-plan").toString + "/wide"
    (1 to 500).map(i =>
      (i.toLong, s"name$i", s"lang${i % 4}", s"source$i", s"payload$i" * 10, i * 1.5))
      .toDF("id", "name", "lang", "source", "payload", "weight")
      .write.parquet(dir)
    dir
  }

  test("filter pushdown: a plain predicate reaches the parquet scan") {
    val q = spark.read.parquet(wideDir)
      .where(col("lang") === "lang2")
      .select(col("id"), sim_jaro_winkler(col("name"), lit("name42")).as("jw"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(lang,lang2)"), plan.take(1200))
    assert(q.count() === 125)
  }

  test("column pruning survives custom similarity expressions") {
    val q = spark.read.parquet(wideDir)
      .select(col("id"), sim_levenshtein(col("name"), lit("name1")).as("s"))
    val scan = q.queryExecution.executedPlan.toString
    // only the referenced columns are read — the wide payload/source/weight
    // columns must NOT appear in the scan schema
    val readSchema = scan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("id") && readSchema.contains("name"), readSchema)
    assert(!readSchema.contains("payload") && !readSchema.contains("weight"), readSchema)
  }

  test("similarity expressions execute inside WholeStageCodegen") {
    val q = spark.read.parquet(wideDir)
      .select(sim_jaro_winkler(col("name"), lit("name42")).as("jw"),
        sim_levenshtein(col("name"), col("source")).as("lev"),
        sim_qgram(col("name"), col("source"), 2, 1).as("qg"))
      .where(col("jw") > 0.5)
    val s = q.queryExecution.executedPlan.toString
    // `*(N)` is the WholeStageCodegen marker in the simple plan format: BOTH
    // the Project carrying the sim_* expressions and the Filter evaluating
    // one must be inside a codegen stage (doGenCode, not interpreted
    // fallback)
    val projectLine = s.linesIterator.find(l => l.contains("Project") && l.contains("sim_jaro"))
    assert(projectLine.exists(_.contains("*(")), s.take(1200))
    val filterLine = s.linesIterator.find(l => l.contains("Filter") && l.contains("sim_jaro"))
    assert(filterLine.exists(_.contains("*(")), s.take(1200))
    assert(!s.contains("CodegenFallback"), s.take(1200))
    assert(q.count() > 0)
  }

  test("blocking-key grouping partially aggregates before the exchange (map-side combine)") {
    val q = spark.read.parquet(wideDir)
      .groupBy(col("lang")).agg(count("*").as("n"))
    val s = q.queryExecution.executedPlan.toString
    // two HashAggregates around one Exchange = partial + final (map-side
    // combine), the shape every blocking-count stage relies on at 100 TB
    val aggs = s.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2, s.take(1500))
    assert(s.contains("Exchange"), s.take(1500))
    assert(q.count() === 4)
  }

  test("q_best_match_agg is single-pass: one scan per input table (VERDICT r3 #5)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val q = SparkEntry.queries("q_best_match_agg")(spark, "/root/testdata/sf0.001")
    assert(q.count() > 0) // finalize any adaptive plan before collecting scans
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] = p.collect {
      case s: FileSourceScanExec => s.relation.location.rootPaths.mkString
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }.flatMap {
      case s: String => Seq(s)
      case p: org.apache.spark.sql.execution.SparkPlan => scans(p)
    }
    val paths = scans(q.queryExecution.executedPlan)
    // the old self-join-with-max shape read customer and supplier TWICE each;
    // the max_by rewrite must read each exactly once
    assert(paths.count(_.contains("customer")) === 1, paths.mkString("\n"))
    assert(paths.count(_.contains("supplier")) === 1, paths.mkString("\n"))
  }
}
