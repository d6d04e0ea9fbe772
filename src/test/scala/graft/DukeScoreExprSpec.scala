package graft

import org.apache.spark.sql.functions._

import graft.model.MatchConfig
import graft.pipeline.{ErPipeline, Fixtures}

/** The fused DukeScore Catalyst expression must be bit-identical to the
  * mandated mapPartitions scoring path on the real pipeline (SURVEY.md M5
  * "perf A/B vs UDF path" — parity half of the A/B).
  */
class DukeScoreExprSpec extends SparkSpec {

  test("scoreFused == score, bit-for-bit, on the fixture pipeline") {
    val config = MatchConfig.fixture
    val docs = Fixtures.docs(spark, 400)
    val records = ErPipeline.extract(docs, config)
    val (pairIds, _) = ErPipeline.pairs(ErPipeline.block(records))

    val viaMapPartitions = ErPipeline.score(pairIds, records, config)
      .collect().map(p => (p.a_id, p.b_id) -> p.score).toMap
    val viaExpr = ErPipeline.scoreFused(pairIds, records, config)
      .collect().map(p => (p.a_id, p.b_id) -> p.score).toMap

    assert(viaExpr.keySet === viaMapPartitions.keySet)
    val drift = viaExpr.count { case (k, v) => viaMapPartitions(k) != v }
    assert(drift === 0, s"$drift of ${viaExpr.size} fused scores differ")
    assert(viaExpr.nonEmpty)
  }

  test("fused expression handles missing / empty properties (P3 skip)") {
    import spark.implicits._
    val config = MatchConfig.fixture
    // records with absent phone/media on one side — factor must be skipped,
    // never scored as a mismatch
    val recs = Seq(
      ErPipeline.CleanRecord("x1", Map(
        "name" -> Seq("john smith"), "address" -> Seq("1 oak st salem"),
        "phone" -> Nil, "media" -> Nil)),
      ErPipeline.CleanRecord("x2", Map(
        "name" -> Seq("john smith"), "address" -> Seq("1 oak st salem"),
        "phone" -> Seq("5551234"), "media" -> Seq("m://a")))).toDS()
    val pairs = Seq(ErPipeline.PairIds("x1", "x2", "k")).toDS()
    val fused = ErPipeline.scoreFused(pairs, recs, config).collect()(0).score
    val plain = ErPipeline.score(pairs, recs, config).collect()(0).score
    assert(fused === plain)
    // name + address agree and nothing contradicts -> confident match
    assert(fused > config.threshold)
  }
}
