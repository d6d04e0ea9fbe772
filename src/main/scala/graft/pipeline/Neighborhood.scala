package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorted-neighborhood blocking (SURVEY.md §2.6 J4, Duke
  * `InMemoryBlockingDatabase` + `KeyFunction`): records sorted by a blocking
  * key; each record pairs with its `w` successors in sort order.
  *
  * Scale path: a naive `row_number() OVER (ORDER BY key)` funnels the whole
  * table through ONE task. Here the global rank is computed distributed —
  * range-partition by the sort key, rank locally per partition, then add
  * broadcast per-partition offsets (two narrow passes + one tiny driver agg);
  * the neighborhood join is equi-ized by exploding each row to its `w`
  * successor ranks, so it stays a hash join, never a nested loop.
  */
object Neighborhood {

  /** Globally contiguous dense rank (1-based) by (key, id) without a
    * single-partition sort. Output: input columns + `rank`.
    */
  def globalRank(df: DataFrame, key: Column, id: Column, partitions: Int): DataFrame = {
    val ranged = df
      .repartitionByRange(partitions, key, id)
      .withColumn("__pid", spark_partition_id())
    val local = ranged.withColumn("__lrn",
      row_number().over(Window.partitionBy(col("__pid")).orderBy(key, id)))
    // per-partition counts -> cumulative offsets (tiny: one row per partition)
    val counts = local.groupBy(col("__pid")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val cum = counts.keys.toSeq.sorted.foldLeft((Map.empty[Int, Long], 0L)) {
      case ((m, acc), pid) => (m + (pid -> acc), acc + counts(pid))
    }._1
    val offsetExpr = cum.foldLeft(lit(0L)) { case (e, (pid, off)) =>
      when(col("__pid") === pid, lit(off)).otherwise(e)
    }
    local.withColumn("rank", col("__lrn").cast("long") + offsetExpr)
      .drop("__pid", "__lrn")
  }

  /** Candidate pairs (a_id, b_id): every record with its 1..w successors in
    * (key, id) order — equi-join on exploded successor ranks.
    */
  def pairs(df: DataFrame, key: Column, id: Column, w: Int, partitions: Int = 32): DataFrame = {
    val ranked = globalRank(df.select(id.as("__id"), key.as("__k")), col("__k"), col("__id"), partitions)
    val left = ranked.select(col("__id").as("a_id"),
      explode(sequence(col("rank") + 1, col("rank") + w)).as("rank"))
    val right = ranked.select(col("__id").as("b_id"), col("rank"))
    left.join(right, "rank").select(col("a_id"), col("b_id"))
  }
}
