package graft

import graft.api.EntityResolution
import graft.model.{MatchConfig, PropertySpec}

/** Reference-parity scenario (SURVEY.md §5.2 #6, FIXTURES.md §4): the upstream
  * plugin's integration-test shape — a small indexed corpus, one query record,
  * expected probabilities computed BY HAND from the Duke formulas (§8), not by
  * calling our own kernel.
  */
class EntityResolutionApiSpec extends SparkSpec {

  // the survey's §1.2 example query: city ~ "South", Levenshtein, low .1 high .95
  private val config = MatchConfig.fromJson(
    """{ "threshold": 0.9, "maybeThreshold": 0.65, "properties": [
      |  {"name": "city",
      |   "cleaners": ["no.priv.garshol.duke.cleaners.TrimCleaner",
      |                "no.priv.garshol.duke.cleaners.LowerCaseNormalizeCleaner"],
      |   "comparator": "no.priv.garshol.duke.comparators.Levenshtein",
      |   "low": 0.1, "high": 0.95}
      |] }""".stripMargin)

  private val eps = 1e-12

  test("function_score parity: per-candidate probabilities match the §8 math") {
    import spark.implicits._
    val corpus = Seq(
      ("d1", " South "),      // exact after cleaning     -> sim 1.0
      ("d2", "Sooth"),        // d=1/5 -> sim 0.8
      ("d3", "North"),        // d=2/5 -> sim 0.6
      ("d4", "Southfield"))   // len ratio 5/10 <= .5 -> sim 0 -> low
      .toDF("doc_id", "city")

    val got = EntityResolution.topK(corpus, Map("city" -> Seq("South")), config, k = 10)
      .select("doc_id", "score").collect()
      .map(r => r.getString(0) -> r.getDouble(1))

    // hand-computed: bayes(0.5, p) = p; p = (0.95-0.5)*sim^2+0.5 if sim>=0.5 else 0.1
    def p(sim: Double) = if (sim >= 0.5) 0.45 * sim * sim + 0.5 else 0.1
    val expected = Map(
      "d1" -> p(1.0),                 // 0.95
      "d2" -> p(0.8),                 // 0.788
      "d3" -> p(0.6),                 // 0.662
      "d4" -> 0.1)
    assert(got.map(_._1).toSeq === Seq("d1", "d2", "d3", "d4")) // ranked by score
    got.foreach { case (id, s) =>
      assert(math.abs(s - expected(id)) < eps, s"$id: $s vs ${expected(id)}")
    }

    val buckets = EntityResolution.classify(
      EntityResolution.scored(corpus, Map("city" -> Seq("South")), config), config)
      .collect().map(r => r.getAs[String]("doc_id") -> r.getAs[String]("bucket")).toMap
    assert(buckets === Map("d1" -> "match", "d2" -> "maybe", "d3" -> "maybe", "d4" -> "no-match"))
  }

  test("multi-valued fields take the best pair; missing fields are skipped") {
    import spark.implicits._
    val cfg2 = MatchConfig(0.9, 0.65, config.properties :+
      graft.model.PropertySpec("phone", Seq("digits-only"), "exact", 0.05, 0.98))
    val corpus = Seq(
      ("m1", Seq("Oslo", "South"), "555-123"),   // best city = exact
      ("m2", Seq("Oslo", "Bergen"), null))        // no city match, phone missing
      .toDF("doc_id", "city", "phone")

    val got = EntityResolution.scored(
      corpus, Map("city" -> Seq("South"), "phone" -> Seq("555123")), cfg2)
      .collect().map(r => r.getAs[String]("doc_id") -> r.getAs[Double]("score")).toMap

    // m1: bayes(bayes(0.5, 0.95), 0.98); m2: city low only (phone skipped)
    val m1 = {
      val b1 = 0.95
      b1 * 0.98 / (b1 * 0.98 + (1 - b1) * (1 - 0.98))
    }
    assert(math.abs(got("m1") - m1) < eps)
    assert(math.abs(got("m2") - 0.1) < eps)
  }

  test("scored() stays analyzable at high property counts (fused kernel, no 5^P tree)") {
    import spark.implicits._
    // 16 properties: a Column-level Bayes fold embeds the accumulator ~5x per
    // property (5^16 node tree — analysis would hang); the fused kernel path
    // must analyze and run quickly
    val props = (1 to 16).map(i =>
      PropertySpec(s"p$i", Seq("lowercase-normalize"), "exact", 0.2, 0.9))
    val cfg = MatchConfig(0.9, 0.65, props)
    val row = (1 to 16).map(i => s"V$i")
    val corpus = Seq(("d1", row)).map { case (id, vs) =>
      (id +: vs).mkString("|") }.toDF("raw")
      .selectExpr(Seq("split(raw, '\\\\|')[0] AS doc_id") ++
        (1 to 16).map(i => s"split(raw, '\\\\|')[$i] AS p$i"): _*)
    val query = (1 to 16).map(i => s"p$i" -> Seq(s"v$i")).toMap
    val t0 = System.nanoTime()
    val got = EntityResolution.scored(corpus, query, cfg).select("score").collect()
    val secs = (System.nanoTime() - t0) / 1e9
    // all 16 properties agree -> bayes fold of 0.9 sixteen times from 0.5
    val expected = (1 to 16).foldLeft(0.5)((acc, _) =>
      acc * 0.9 / (acc * 0.9 + (1 - acc) * (1 - 0.9)))
    assert(math.abs(got(0).getDouble(0) - expected) < eps)
    assert(secs < 60.0, s"16-property scoring took ${secs}s — expression blowup?")
  }

  test("predicate narrows candidates before scoring (retrieve-then-score)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val corpus = (1 to 100).map(i => (s"d$i", if (i % 10 == 0) "South" else "Elsewhere"))
      .toDF("doc_id", "city")
    val hits = EntityResolution.topK(
      corpus, Map("city" -> Seq("South")), config, k = 5,
      predicate = col("city").startsWith("S"))
    assert(hits.count() === 5)
    assert(hits.collect().forall(_.getAs[Double]("score") === 0.95))
  }

  test("explained: per-property factors match hand math and fold back to score") {
    import spark.implicits._
    val cfg2 = MatchConfig(
      threshold = 0.9, maybeThreshold = 0.65,
      properties = Seq(
        PropertySpec("city", Seq("trim", "lowercase-normalize"), "levenshtein", 0.1, 0.95),
        PropertySpec("phone", Seq("digits-only"), "exact", 0.05, 0.98)))
    val corpus = Seq(
      ("d1", "South", "555-123"),
      ("d2", "Sooth", "999 000"),
      ("d3", "North", null)) // missing phone -> factor 0.5 (no evidence)
      .toDF("doc_id", "city", "phone")

    val rows = EntityResolution.explained(
      corpus, Map("city" -> Seq("South"), "phone" -> Seq("555123")), cfg2)
      .select("doc_id", "score", "explain").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getMap[String, Double](2).toMap))).toMap

    def pCity(sim: Double) = if (sim >= 0.5) 0.45 * sim * sim + 0.5 else 0.1
    def bayes(a: Double, b: Double) = a * b / (a * b + (1 - a) * (1 - b))
    assert(math.abs(rows("d1")._2("city") - pCity(1.0)) < eps)
    assert(math.abs(rows("d1")._2("phone") - 0.98) < eps)
    assert(math.abs(rows("d2")._2("city") - pCity(0.8)) < eps)
    assert(math.abs(rows("d2")._2("phone") - 0.05) < eps)
    assert(math.abs(rows("d3")._2("phone") - 0.5) < eps) // missing -> prior
    // folding the factors in config order reproduces the score exactly
    rows.values.foreach { case (score, ex) =>
      val folded = bayes(bayes(0.5, ex("city")), ex("phone"))
      assert(math.abs(folded - score) < eps, s"$folded vs $score")
    }
  }
}
