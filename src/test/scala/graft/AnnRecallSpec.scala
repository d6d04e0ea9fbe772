package graft

import org.apache.spark.sql.functions._

import graft.jobs.AnnRecall

class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  /** 40 vectors = 20 exact-twin pairs (vec 2i and 2i+1 identical): a twin
    * shares every LSH band bucket and every IVF list with its query by
    * construction, and its cosine is exactly 1.0, so recall@1 must be 1.0
    * for all three methods regardless of parameters.
    */
  private lazy val twins = {
    val base = (0 until 20).map { i =>
      val r = new scala.util.Random(1000 + i)
      Array.fill(8)((r.nextDouble() * 2 - 1).toFloat)
    }
    (0 until 40).map(v => (v.toLong, base(v / 2))).toDF("vec_id", "embedding")
  }

  test("planted exact twins: recall@1 is 1.0 for brute force, LSH and IVF") {
    val rs = AnnRecall.measure(spark, twins, k = 1)
    assert(rs.map(_.method) === Seq("brute_force", "sign_lsh", "ivf"))
    for (r <- rs) {
      assert(r.recallAtK === 1.0, s"${r.method}: $r")
      assert(r.candFraction > 0.0 && r.candFraction <= 1.0)
    }
    // the ANN families examined strictly fewer pairs than brute force
    assert(rs(1).candFraction < 1.0)
    assert(rs(2).candFraction < 1.0)
  }
}
