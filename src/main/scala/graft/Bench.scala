package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session/codegen warm-up outside any query's measurement
    // (divide before summing: sum of raw xxhash64 longs overflows under ANSI)
    spark.range(100000).selectExpr("sum(xxhash64(id) / 1e9)").collect()
    // dev aid: SPARK_GRAFT_ONLY=q_a,q_b restricts the run (driver leaves it unset)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    // min-of-N passes (same methodology as graft.jobs.ScalingBench, documented
    // in BASELINE.md "Sandbox CPU calibration"): this VM's delivered CPU swings
    // up to 7× over minutes and JIT/codegen warm-up lands on whichever query
    // runs a heavy kernel first, so a single pass mis-attributes both. Queries
    // run in sorted-name order (stable across rounds — a Map-order change must
    // never look like a perf change), N full passes, per-query minimum.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    var failed = Set.empty[String]
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to reps; name <- names) {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch {
        case e: Throwable => // a broken query must fail the bench, not hide at -1
          System.err.println(s"[bench] query $name FAILED: $e")
          failed += name
      }
      val dt = (System.nanoTime() - t0) / 1e9
      if (!best.get(name).exists(_ <= dt)) best(name) = dt
    }
    val qs = names.map(k => s"\"" + k + "\":" + best(k)).mkString("{", ",", "}")
    val total = names.map(best).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"agg":"min","failed":${failed.size}}""")
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[bench] FAILED queries: ${failed.mkString(", ")}")
      sys.exit(1)
    }
  }
}
