package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.functions.{duke_factor_multi, bayes_combine}
import graft.model.MatchConfig

/** The reference plugin's query surface, Spark-native (SURVEY.md §3.1):
  * an ordinary predicate selects candidate documents, and this API computes,
  * per candidate, the Duke probability that it denotes the same real-world
  * entity as the query record — returned as a `score` column / top-k list,
  * exactly the `function_score` + native-script contract of
  * `[U EntityResolutionScript.java#runAsDouble]`.
  *
  * Candidate columns are matched to config properties by name; each may be
  * `string` or `array<string>`. Cleaners run on BOTH sides per property
  * (`[U EntityResolutionScript.java#ctor]`), missing values skip (P3),
  * multi-values take the max (A2), factors fold from the 0.5 prior (A3).
  */
object EntityResolution {

  /** Add a `score` column: probability(candidate ≙ query record). */
  def scored(
      candidates: DataFrame,
      query: Map[String, Seq[String]],
      config: MatchConfig): DataFrame = {
    val present = candidates.columns.toSet
    val scoreCol = config.properties.foldLeft(lit(0.5)) { (acc, spec) =>
      val qv = query.getOrElse(spec.name, Nil).filter(v => v != null && v.nonEmpty)
      if (qv.isEmpty || !present.contains(spec.name)) acc // no evidence either side
      else {
        val qCol: Column = array(qv.map(lit): _*)
        val cRaw = candidates.schema(spec.name).dataType.typeName match {
          case "array" => col(spec.name)
          case _       => array(col(spec.name))
        }
        val f = duke_factor_multi(spec, qCol, cRaw)
        when(f.isNull, acc).otherwise(bayes_combine(acc, f))
      }
    }
    candidates.withColumn("score", scoreCol)
  }

  /** Scored search: predicate (the "ES query") -> score -> global top-k —
    * the shard-heap + coordinator-merge of the reference collapses into
    * Spark's TakeOrderedAndProject.
    */
  def topK(
      candidates: DataFrame,
      query: Map[String, Seq[String]],
      config: MatchConfig,
      k: Int,
      predicate: Column = lit(true)): DataFrame =
    scored(candidates.where(predicate), query, config)
      .orderBy(col("score").desc)
      .limit(k)

  /** Threshold classification of a scored frame (match / maybe / no-match). */
  def classify(scoredDf: DataFrame, config: MatchConfig): DataFrame =
    scoredDf.withColumn("bucket",
      when(col("score") >= config.threshold, "match")
        .when(col("score") >= config.maybeThreshold, "maybe")
        .otherwise("no-match"))
}
