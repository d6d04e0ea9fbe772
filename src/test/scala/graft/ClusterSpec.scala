package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Cluster

/** Large-star/small-star connected components (SURVEY.md §2.7 G8) vs a
  * driver-side union-find oracle on seeded random graphs.
  */
class ClusterSpec extends SparkSpec {

  private def unionFind(n: Int, edges: Seq[(Int, Int)]): Map[Int, Int] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    (0 until n).map(i => i -> find(find(i))).toMap
  }

  private def check(n: Int, edges: Seq[(Int, Int)]): Unit = {
    import spark.implicits._
    val df = edges.map { case (a, b) => (f"v$a%05d", f"v$b%05d") }.toDF("a", "b")
    val got = Cluster.connectedComponents(df).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val oracle = unionFind(n, edges)
    val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
    assert(got.size === touched.size) // every node with an edge is labeled
    for (v <- touched) {
      val wantRoot = oracle(v)
      // oracle root is the min node of the component by construction of union
      assert(got(f"v$v%05d") === f"v$wantRoot%05d", s"node $v")
    }
  }

  test("simple chain + triangle + singleton-free graph") {
    check(10, Seq((0, 1), (1, 2), (2, 3), (5, 6), (6, 7), (5, 7), (8, 9)))
  }

  test("star and long path converge in O(log n) iterations") {
    check(64, (1 until 40).map(i => (0, i)) ++ (40 until 63).map(i => (i, i + 1)))
  }

  test("random graphs match union-find oracle") {
    val r = new scala.util.Random(37)
    for (trial <- 1 to 5) {
      val n = 120
      val m = 90 + r.nextInt(60)
      val edges = (0 until m).map(_ => (r.nextInt(n), r.nextInt(n))).filter(e => e._1 != e._2)
      check(n, edges)
    }
  }

  test("duplicate and reversed edges are harmless") {
    check(6, Seq((0, 1), (1, 0), (0, 1), (4, 3), (3, 4), (1, 2)))
  }

  test("cluster label is the component minimum (deterministic tie-break)") {
    import spark.implicits._
    val df = Seq(("z9", "m5"), ("m5", "a1"), ("q7", "a1")).toDF("x", "y")
    val got = Cluster.connectedComponents(df).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.values.toSet === Set("a1"))
    assert(got.keySet === Set("z9", "m5", "a1", "q7"))
  }

  test("pre-contraction on/off produce identical labelings (long chains, long ids)") {
    import spark.implicits._
    // three chains of length 80 over LONG ids — the adversarial diameter case
    val edges = (0 until 3).flatMap(c => (0 until 80).map(i => (c * 1000L + i, c * 1000L + i + 1)))
    val df = edges.toDF("x", "y").repartition(13)
    def run(pc: Boolean) = Cluster.connectedComponents(df, preContract = pc).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val withC = run(true)
    val withoutC = run(false)
    assert(withC === withoutC)
    assert(withC.values.toSet === Set(0L, 1000L, 2000L))
    assert(withC.size === 3 * 81)
  }

  test("reliable-checkpoint truncation path (checkpoint dir set) matches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val df = Seq((1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L), (7L, 5L)).toDF("x", "y")
      val got = Cluster.connectedComponents(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 5L))
    } finally {
      // leave no checkpoint dir behind for other suites sharing the session
      spark.sparkContext.setCheckpointDir(null)
    }
  }
}
