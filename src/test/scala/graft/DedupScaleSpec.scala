package graft

import org.apache.spark.sql.functions._

import graft.jobs.DedupScale

/** The dedup scaling corpus must be a pure function of the base table —
  * byte-identical across invocations and core counts — or the N-vs-4N
  * comparison measures different inputs.
  */
class DedupScaleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = (0 until 20)
    .map(i => (s"d$i", s"alpha bravo charlie delta echo foxtrot golf hotel india juliett base$i"))
    .toDF("doc_id", "text")

  test("expand is deterministic and 50x with the documented role mix") {
    val a = DedupScale.expand(base).orderBy("doc_id").collect()
    val b = DedupScale.expand(base).orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
    assert(a.length === 20 * 50)

    val df = DedupScale.expand(base)
    // 40% of replicas are byte-identical to the base text
    val exact = df.join(base.select($"text".as("orig")), $"text" === $"orig")
      .count()
    assert(exact === 20 * 20L)
    // 30% carry a unique salt token -> globally distinct texts
    val uniq = df.where($"text".rlike(" uniq\\d+$")).count()
    assert(uniq === 20 * 15L)
    // 30% near copies, each distinct (role-tagged swap token)
    assert(df.select($"text").distinct().count() === 20L + 20 * 15L + 20 * 15L)
  }

  test("baseReps multiplies into independent families with zero token overlap") {
    val df = DedupScale.expand(base, baseReps = 3)
    assert(df.count() === 20 * 3 * 50L)
    assert(df.select($"doc_id").distinct().count() === 20 * 3 * 50L)
    // families share no tokens -> no shingle can collide across replicas
    val fam = df.withColumn("fam", pmod(($"doc_id" / 50).cast("long"), lit(3)))
      .select($"fam", explode(split($"text", " ")).as("tok"))
      .where(!$"tok".rlike("^uniq")) // uniq salt is doc-unique already
      .groupBy($"tok").agg(countDistinct($"fam").as("nf"))
      .agg(max($"nf")).collect()(0).getLong(0)
    assert(fam === 1L)
  }

  test("recall vs planted ground truth on an end-to-end DedupJob run") {
    val dir = java.nio.file.Files.createTempDirectory("dedupscale").toString
    val corpus = DedupScale.expand(base)
    graft.jobs.DedupJob.run(spark, corpus, s"$dir/out")
    val r = DedupScale.recall(corpus, spark.read.parquet(s"$dir/out/decisions"))
    // 11-token bases, k=3 shingles: per base the 19 exact copies (J=1) and
    // 15 uniq-salted replicas (J=0.9) are true pairs, plus the 4 near
    // copies whose swap lands at an END token (kills one shingle, J=0.8
    // exactly); the 11 interior swaps kill ~3 of 9 shingles (J~0.5-0.64),
    // legitimately below the 0.80 gate -> sub-threshold
    assert(r.truePairs === 20 * 38L, s"truth pairs: $r")
    assert(r.subThresholdPairs === 20 * 11L, s"sub-threshold: $r")
    // banding at J=0.8 has a small deterministic miss rate; exact copies
    // and J=0.9 pairs band reliably
    assert(r.recall >= 0.95, s"recall: $r")

    // calibration buckets: only true pairs, sane recall values, and the
    // exact-duplicate bucket is 1.0 by the exact-group pre-pass guarantee
    val buckets = DedupScale.recallByBucket(
      corpus, spark.read.parquet(s"$dir/out/decisions"),
      graft.TrainingOps.config.minhashBands).collect()
    assert(buckets.map(_.getLong(1)).sum === r.truePairs)
    for (b <- buckets) {
      // buckets are 20000 wide, so the lowest true-pair bucket floor can sit
      // up to one full bucket width below the threshold
      assert(b.getLong(0) > graft.TrainingOps.config.jaccardMinMicro - 20000)
      assert(b.getDouble(3) >= 0.0 && b.getDouble(3) <= 1.0)
    }
    val exactBucket = buckets.filter(_.getLong(0) === 1000000L)
    assert(exactBucket.length === 1 && exactBucket.head.getDouble(3) === 1.0)
  }

  test("near-copy replicas differ from THEIR base by exactly one token") {
    val e = DedupScale.expand(base)
    // role-0 replica == the base text; pair every near replica with it via
    // doc_id arithmetic (no reliance on generation order)
    val orig = e.where(pmod($"doc_id", lit(50)) === 0)
      .select(($"doc_id" / 50).cast("long").as("b"), $"text".as("orig"))
    val near = e
      .withColumn("role", pmod($"doc_id", lit(50)))
      .where($"role" >= 20 && $"role" < 35)
      .select(($"doc_id" / 50).cast("long").as("b"), $"text")
      .join(orig, "b")
      .select(
        size(array_except(split($"text", " "), split($"orig", " "))).as("extra"),
        (size(split($"text", " ")) === size(split($"orig", " "))).as("same_len"),
        ($"text" === $"orig").as("identical"))
      .collect()
    assert(near.length === 20 * 15)
    for (r <- near) {
      assert(r.getInt(0) === 1, "exactly one new token")
      assert(r.getBoolean(1), "token count preserved")
      assert(!r.getBoolean(2))
    }
  }
}
