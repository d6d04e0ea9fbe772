package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkEntry.cosMicro
import graft.TrainingOps.{annBands, annPlanesPerBand, config}
import graft.expr.functions.{sign_lsh_bucket, vec_dot, vec_norm}

/** Recall@k of the two ANN families against the exact brute-force baseline —
  * the similarity-search twin of `DedupScale recall`: the oracle queries
  * (`q_embed_ann_lsh` / `q_embed_ann_ivf`, SparkEntry.scala) pin CORRECTNESS
  * of the plan shapes on 8 fixed queries; this job measures QUALITY of the
  * same shapes over every vector as a query, so the documented design-point
  * math (bands x planes, IVF K/probes) gets a measured curve next to it.
  *
  * All three methods share one candidate->re-rank tail; they differ only in
  * the candidate generator (all pairs / band buckets / probed inverted
  * lists), exactly like the production queries.
  *
  * Run: spark-submit --class graft.jobs.AnnRecall <jar> <embeddingsParquet> [k]
  */
object AnnRecall {

  private def rerank(cand: DataFrame, vecs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_micro").desc, col("cid"))
    cand
      .join(vecs.select(col("vec_id").as("qid"), col("embedding").as("qv"), col("nrm").as("qn")), "qid")
      .join(vecs.select(col("vec_id").as("cid"), col("embedding").as("cv"), col("nrm").as("cn")), "cid")
      .withColumn("cos_micro", cosMicro("qv", "cv", "qn", "cn"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("qid"), col("cid"))
  }

  case class Result(method: String, recallAtK: Double, candFraction: Double)

  /** recall@k = |method top-k ∩ exact top-k| / |exact top-k| summed over all
    * queries (exact top-k ties broken by cid, same as every production
    * query, so the target set is well-defined).
    */
  def measure(spark: SparkSession, emb: DataFrame, k: Int,
      bands: Int = annBands, planes: Int = annPlanesPerBand,
      ivfCentroids: Int = config.ivfCentroids,
      ivfProbes: Int = config.ivfProbes): Seq[Result] = {
    val e = emb.select(col("vec_id"), col("embedding"), vec_norm(col("embedding")).as("nrm"))
      .cache()
    val n = e.count()
    // the exact baseline is O(n²) BY DESIGN — same guard discipline as the
    // labeled brute-force production query (SURVEY §2.6 J5): refuse inputs
    // where the quadratic target itself is the mistake
    require(n >= 2, s"recall needs at least 2 vectors, got $n")
    require(n <= 100000,
      s"AnnRecall computes an exact n² baseline ($n vectors -> ${n * n} pairs); " +
        "measure recall on a sample <= 100k vectors")
    val vecs = e

    // exact baseline: every vector is a query
    val all = e.select(col("vec_id").as("qid")).crossJoin(e.select(col("vec_id").as("cid")))
      .where(col("qid") =!= col("cid"))
    val exact = rerank(all, vecs, k).cache()
    val exactN = exact.count()

    // sign-LSH banded candidates (q_embed_ann_lsh shape, all queries)
    val banded = e.select(
      Seq(col("vec_id")) ++ (0 until bands).map(bn =>
        sign_lsh_bucket(col("embedding"), bn, planes).as(s"band$bn")): _*)
    val bandArr = s"array(${(0 until bands).map(bn => s"band$bn").mkString(",")})"
    val buckets = banded.selectExpr("vec_id", s"posexplode($bandArr) AS (band_ix, bucket)")
    val lshCand = buckets.select(col("vec_id").as("qid"), col("band_ix"), col("bucket"))
      .join(buckets.select(col("vec_id").as("cid"), col("band_ix"), col("bucket")),
        Seq("band_ix", "bucket"))
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid")).distinct().cache()

    // IVF candidates (q_embed_ann_ivf shape, all queries)
    val cents = e.where(col("vec_id") < ivfCentroids)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"), col("nrm").as("cn"))
    val aw = Window.partitionBy(col("vec_id")).orderBy(col("cos_micro").desc, col("cent_id"))
    val ranked = e.join(broadcast(cents))
      .withColumn("cos_micro", cosMicro("embedding", "cv", "nrm", "cn"))
      .select(col("vec_id"), col("cent_id"), col("cos_micro"))
      .withColumn("crk", row_number().over(aw))
    val lists = ranked.where(col("crk") === 1).select(col("vec_id").as("cid"), col("cent_id"))
    val probes = ranked.where(col("crk") <= ivfProbes)
      .select(col("vec_id").as("qid"), col("cent_id"))
    val ivfCand = probes.join(lists, "cent_id")
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid")).distinct().cache()

    def recallOf(cand: DataFrame): (Double, Double) = {
      val hits = rerank(cand, vecs, k).join(exact, Seq("qid", "cid"), "left_semi").count()
      (hits.toDouble / exactN, cand.count().toDouble / (n.toDouble * (n - 1)))
    }
    val (lshR, lshF) = recallOf(lshCand)
    val (ivfR, ivfF) = recallOf(ivfCand)
    Seq(e, exact, lshCand, ivfCand).foreach(_.unpersist())
    Seq(
      Result("brute_force", 1.0, 1.0),
      Result("sign_lsh", lshR, lshF),
      Result("ivf", ivfR, ivfF))
  }

  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/root/testdata/sf0.1/embeddings.parquet")
    val k = args.lift(1).map(_.toInt).getOrElse(5)
    val bands = args.lift(2).map(_.toInt).getOrElse(annBands)
    val planes = args.lift(3).map(_.toInt).getOrElse(annPlanesPerBand)
    val ivfC = args.lift(4).map(_.toInt).getOrElse(config.ivfCentroids)
    val ivfP = args.lift(5).map(_.toInt).getOrElse(config.ivfProbes)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .appName("graft-ann-recall")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rs = measure(spark, spark.read.parquet(path), k, bands, planes, ivfC, ivfP)
    val js = rs.map(r =>
      s"""{"method":"${r.method}","recall_at_$k":${r.recallAtK},"cand_fraction":${r.candFraction}}""")
      .mkString("[", ",", "]")
    println(s"""{"metric":"ann_recall","k":$k,"results":$js,""" +
      s""""bands":$bands,"planes_per_band":$planes,""" +
      s""""ivf_centroids":$ivfC,"ivf_probes":$ivfP}""")
    spark.stop()
  }
}
