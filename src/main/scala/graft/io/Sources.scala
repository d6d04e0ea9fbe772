package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.expr.functions.clean_chain

/** Batch sources with Duke-style per-column cleaner chains applied on read —
  * the Spark analog of `[D datasources/CsvDataSource.java]` (SURVEY.md §2.1
  * S4/S5): a source yields cleaned Duke records, cleaning happens once at
  * ingest, declaratively (inside the scan's codegen stage), never per pair.
  */
object Sources {

  /** CSV with header -> DataFrame with the configured cleaner chains applied
    * to the named columns (other columns pass through untouched).
    */
  def csv(
      spark: SparkSession,
      path: String,
      cleaners: Map[String, Seq[String]] = Map.empty): DataFrame =
    withCleaners(spark.read.option("header", "true").csv(path), cleaners)

  /** JSON-lines source, same contract. */
  def jsonLines(
      spark: SparkSession,
      path: String,
      cleaners: Map[String, Seq[String]] = Map.empty): DataFrame =
    withCleaners(spark.read.json(path), cleaners)

  /** Parquet source, same contract (the sandbox's primary format). */
  def parquet(
      spark: SparkSession,
      path: String,
      cleaners: Map[String, Seq[String]] = Map.empty): DataFrame =
    withCleaners(spark.read.parquet(path), cleaners)

  private def withCleaners(df: DataFrame, cleaners: Map[String, Seq[String]]): DataFrame =
    cleaners.foldLeft(df) { case (acc, (column, chain)) =>
      acc.withColumn(column, clean_chain(chain, col(column)))
    }
}
