package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.jobs.LinkJob
import graft.model.MatchConfig
import graft.pipeline.Fixtures

/** Duke LinkDatabase override semantics on the production job: a human
  * `verified` decision forces an edge the model never scored, a `retracted`
  * decision suppresses an edge the model matched — clustering downstream
  * honors both.
  */
class LinkOverridesSpec extends SparkSpec {

  test("verified forces an edge; retracted suppresses one; clusters follow") {
    import spark.implicits._
    def tmp() = { val p = Files.createTempDirectory("graft-ov"); p.toFile.deleteOnExit(); p.toString }
    val docs = Fixtures.docs(spark, 200)
    val base = tmp()
    LinkJob.run(spark, docs, MatchConfig.fixture, base)

    val clusters = spark.read.parquet(s"$base/clusters").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val edges = spark.read.parquet(s"$base/edges").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet

    // a 2-doc cluster with exactly one edge: retracting it must split them
    val twoDoc = clusters.groupBy(_._2).collectFirst {
      case (cl, ms) if ms.size == 2 &&
        edges.count(e => ms.keySet.contains(e._1) && ms.keySet.contains(e._2)) == 1 =>
        ms.keys.toSeq.sorted
    }.getOrElse(fail("fixture produced no 2-doc single-edge cluster"))
    // two docs from different clusters: verifying must merge them
    val crossPair = {
      val byCluster = clusters.groupBy(_._2).values.map(_.keys.min).toSeq.sorted
      (byCluster(0), byCluster(1))
    }

    val ov = Seq(
      (twoDoc(0), twoDoc(1), "retracted"),
      (crossPair._1, crossPair._2, "VERIFIED") // status case-insensitive
    ).toDF("a_id", "b_id", "status")

    val out = tmp()
    LinkJob.run(spark, docs, MatchConfig.fixture, out, overrides = Some(ov))
    val edges2 = spark.read.parquet(s"$out/edges").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val clusters2 = spark.read.parquet(s"$out/clusters").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

    assert(!edges2.contains((twoDoc(0), twoDoc(1))))
    assert(edges2.contains((crossPair._1, crossPair._2)))
    assert(clusters2(twoDoc(0)) !== clusters2(twoDoc(1)), "retracted pair still clustered")
    assert(clusters2(crossPair._1) === clusters2(crossPair._2), "verified pair not merged")
    // everything untouched by the two overrides keeps its partition: compare
    // same-cluster relations on the unaffected docs
    val touched = Set(twoDoc(0), twoDoc(1), crossPair._1, crossPair._2)
    val affected = clusters.filter { case (_, cl) =>
      touched.exists(t => clusters.get(t).contains(cl)) }.keySet ++
      clusters2.filter { case (_, cl) =>
        touched.exists(t => clusters2.get(t).contains(cl)) }.keySet
    def rel(m: Map[String, String]) = m.filterNot(kv => affected(kv._1))
      .groupBy(_._2).values.map(_.keys.toSeq.sorted).toSet
    assert(rel(clusters) === rel(clusters2))
  }
}
