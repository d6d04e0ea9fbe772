package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.TrainingOps
import graft.expr.functions._

/** Codegen vector kernels must be BIT-identical to their interpreted
  * higher-order-function twins over the real embeddings table — exact double
  * equality, not epsilon (the oracle protocol depends on it).
  */
class VecKernelsSpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  test("vec_norm == declarative normSpark, exactly") {
    val d = emb.select(
      vec_norm(col("embedding")).as("k"),
      expr(TrainingOps.normSpark("embedding")).as("h"))
    assert(d.where(col("k") =!= col("h")).count() === 0L)
    assert(d.count() > 0)
  }

  test("vec_dot == declarative dotSpark over pairs, exactly") {
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val pairs = a.join(b, col("ib") === col("ia") + 1)
    val d = pairs.select(
      vec_dot(col("va"), col("vb")).as("k"),
      expr(TrainingOps.dotSpark("va", "vb")).as("h"))
    assert(d.where(col("k") =!= col("h")).count() === 0L)
    assert(d.count() > 0)
  }

  test("sign_lsh_bucket == declarative lshBandSpark for several band shapes") {
    for ((band, ppb) <- Seq((0, 4), (1, 4), (0, 7), (3, 2))) {
      val d = emb.select(
        sign_lsh_bucket(col("embedding"), band, ppb).as("k"),
        expr(s"CAST(${TrainingOps.lshBandSpark("embedding", band, ppb)} AS BIGINT)").as("h"))
      assert(d.where(col("k") =!= col("h")).count() === 0L, s"band=$band ppb=$ppb")
    }
    // band 0 also reproduces the single-bucket form
    val d0 = emb.select(
      sign_lsh_bucket(col("embedding"), 0, 4).as("k"),
      expr(s"CAST(${TrainingOps.lshBucketSpark("embedding", 4)} AS BIGINT)").as("h"))
    assert(d0.where(col("k") =!= col("h")).count() === 0L)
  }

  test("null propagation") {
    import spark.implicits._
    val got = Seq((Seq(1.0f), null: Seq[Float])).toDF("a", "b")
      .select(vec_dot($"a", $"b"), vec_norm($"b"),
        sign_lsh_bucket($"b", 0, 4)).collect()(0)
    assert(got.isNullAt(0) && got.isNullAt(1) && got.isNullAt(2))
  }
}
