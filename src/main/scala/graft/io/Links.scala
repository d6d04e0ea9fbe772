package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link persistence over JDBC — the Duke `JDBCLinkDatabase` analog
  * (`[D JDBCLinkDatabase.java]`, SURVEY §2.1 S7): match decisions land in a
  * relational table `(a_id, b_id, kind, confidence, run_ts)` where review
  * tooling reads them and writes back human verdicts; the verdict table
  * round-trips into `LinkJob(overrides = …)` so the next run honors them.
  * Spark's JDBC writer parallelizes the insert per partition — one
  * connection per task, not a driver-side row loop.
  */
object Links {

  /** Classified scored pairs -> Duke-style link rows (match/maybe only; a
    * no-match is the absence of a link, as in Duke).
    */
  def toLinks(classified: DataFrame, runTs: Long): DataFrame =
    classified.where(col("bucket") =!= "no-match")
      .select(
        least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"),
        col("bucket").as("kind"),
        col("score").cast("double").as("confidence"),
        lit(runTs).as("run_ts"))

  def writeJdbc(links: DataFrame, url: String, table: String,
      mode: String = "append"): Unit =
    links.write.mode(mode).jdbc(url, table, new java.util.Properties)

  def readJdbc(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.jdbc(url, table, new java.util.Properties)

  /** Human verdicts table -> the `LinkJob.run(overrides = …)` frame:
    * rows (a_id, b_id, status) with status verified/retracted (case
    * preserved; LinkJob lowercases).
    */
  def readOverrides(spark: SparkSession, url: String, table: String): DataFrame =
    readJdbc(spark, url, table).select(col("a_id"), col("b_id"), col("status"))
}
