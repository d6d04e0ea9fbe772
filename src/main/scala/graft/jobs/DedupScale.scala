package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-efficiency evidence for the DEDUP family (extends the north-rule
  * measurement beyond ER scoring — ScalingBench covers that path): the same
  * `DedupJob.run` at N vs 4N cores over the SAME materialized dup-heavy
  * corpus, sandbox proxy for two cluster sizes per the driver instruction.
  *
  * The corpus is synthesized deterministically from the driver's documents
  * table (no external data): each base text expands 50x with a fixed
  * per-replica role — 40% exact copies (exercises the exact-group pre-pass),
  * 30% near copies (exactly ONE token swapped, at index `role mod |tokens|` —
  * always in range, so short docs mutate too; one swap kills ≤ shingleK
  * shingles, keeping shingle-Jaccard above the 0.80 verify threshold for
  * typical doc lengths; exercises banding + verify), 30% distinct-ified
  * (unique salt token appended). `doc_id = base_ord * 50 + role`; every
  * mutation is a pure
  * function of (base_ord, role), so the corpus is byte-identical across runs
  * and core counts.
  *
  * Run:
  *   SPARK_GRAFT_CPUS=8 sbt "runMain graft.jobs.DedupScale prepare /tmp/ds /root/testdata/sf0.1/documents.parquet"
  *   SPARK_GRAFT_CPUS=2 sbt "runMain graft.jobs.DedupScale run /tmp/ds"
  *   SPARK_GRAFT_CPUS=8 sbt "runMain graft.jobs.DedupScale run /tmp/ds"
  */
object DedupScale {

  private val Partitions = 32 // fixed task granularity across core counts

  /** Deterministic 50x dup-heavy expansion of a (doc_id, text) table.
    * `baseReps > 1` first multiplies the base into that many INDEPENDENT
    * families (every token prefixed with a replica tag — zero shingle
    * overlap across replicas), so the whole workload scales linearly with
    * the knob instead of collapsing into cross-replica exact groups.
    */
  def expand(base: DataFrame, baseReps: Int = 1): DataFrame =
    base.select(monotonically_increasing_id().as("base_ord0"), col("text"))
      .withColumn("r", explode(sequence(lit(0), lit(baseReps - 1))))
      .withColumn("base_ord", col("base_ord0") * baseReps + col("r"))
      .withColumn("text", when(col("r") === 0, col("text"))
        .otherwise(concat_ws(" ", expr(
          "transform(split(text, ' '), t -> concat('r', CAST(r AS STRING), t))"))))
      .withColumn("role", explode(sequence(lit(0), lit(49))))
      .withColumn("doc_id", col("base_ord") * 50 + col("role"))
      .withColumn("toks", split(col("text"), " "))
      .withColumn("text2",
        when(col("role") < 20, col("text"))
          .when(col("role") < 35, concat_ws(" ", expr(
            "transform(toks, (t, i) -> IF(i = pmod(role, size(toks)), concat('nd', CAST(role AS STRING), t), t))")))
          .otherwise(concat(col("text"), lit(" uniq"), col("doc_id"))))
      .select(col("doc_id"), col("text2").as("text"))

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("run")
    val dir = args.lift(1).getOrElse("/tmp/graft-dedup-scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-dedup-scale-$mode")
      .config("spark.sql.shuffle.partitions", Partitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    mode match {
      case "prepare" =>
        val basePath = args.lift(2)
          .getOrElse("/root/testdata/sf0.1/documents.parquet")
        val baseReps = args.lift(3).map(_.toInt).getOrElse(1)
        expand(spark.read.parquet(basePath), baseReps)
          .repartition(Partitions).write.mode("overwrite")
          .parquet(s"$dir/corpus")
        println(s"""{"prepared":{"docs":${spark.read.parquet(s"$dir/corpus").count()}}}""")

      case "run" =>
        val docs = spark.read.parquet(s"$dir/corpus")
        val nDocs = docs.count() // also warms the page cache + JIT
        val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
        var last: DedupJob.Summary = null
        // fresh outDir per rep — DedupJob's manifest makes a reused dir a
        // resume no-op, which would time nothing
        val times = (1 to reps).map { i =>
          val out = s"$dir/out-$cpus-$i"
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
          val t0 = System.nanoTime()
          last = DedupJob.run(spark, docs, out)
          (System.nanoTime() - t0) / 1e9
        }
        val best = times.min
        val runsJson = times.map(t => math.round(t * 1000) / 1000.0).mkString("[", ",", "]")
        println(s"""{"metric":"dedup_docs_per_sec","value":${(nDocs / best).round},""" +
          s""""unit":"docs/sec","cores":$cpus,"docs":$nDocs,""" +
          s""""clusters":${last.clusters},"kept":${last.kept},"edges":${last.edges},""" +
          s""""best_seconds":${math.round(best * 1000) / 1000.0},""" +
          s""""runs_seconds":$runsJson,"partitions":$Partitions}""")

      case other => sys.error(s"unknown mode $other (prepare|run)")
    }
    spark.stop()
  }
}
