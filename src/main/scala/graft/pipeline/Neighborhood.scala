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
  * per-partition offsets via a broadcast join; the neighborhood join is
  * equi-ized by exploding each row to its `w` successor ranks, so it stays a
  * hash join, never a nested loop.
  */
object Neighborhood {

  /** Globally contiguous dense rank (1-based) by (key, id) without a
    * single-partition sort. Output: input columns + `rank`.
    *
    * The range partitioning is **pinned** (`Persist.truncate`: reliable
    * checkpoint when a dir is configured — this is a corpus-scale
    * materialization, and executor-local blocks would not survive executor
    * loss on a real cluster — else eager localCheckpoint) before
    * anything reads it: `repartitionByRange` boundaries are sample-based and
    * not stable across separate executions of the same plan, so the offsets
    * job and the consuming job MUST observe one physical partitioning — at
    * scale the reservoir sample differs run to run and unpinned offsets would
    * silently mismatch (duplicate/skipped ranks).
    *
    * Offsets are a one-row-per-partition frame cumulated with a single-task
    * window (≤ `partitions` rows — trivially small) and broadcast-joined back:
    * no chained `when()` offset expression, so codegen survives 10⁴ partitions.
    */
  def globalRank(df: DataFrame, key: Column, id: Column, partitions: Int): DataFrame = {
    // range exchange + narrow in-partition sort, pinned; the ONLY shuffle
    // here. LAZY pin (optimization r6): the first consuming stage
    // materializes the blocks — stability across the offsets job and the
    // consuming joins is preserved (each checkpoint partition is computed
    // once and every later scan reads those blocks), the dedicated eager
    // materialization job is gone.
    val ranged = graft.io.Persist.pinLazy(
      df.repartitionByRange(partitions, key, id)
        .sortWithinPartitions(key, id))
    // local rank WITHOUT a window: a window partitioned by __pid would force
    // Catalyst to insert a hash exchange + sort on __pid (RangePartitioning
    // does not satisfy the window's clustering requirement even though rows
    // of one pid are physically co-located). monotonically_increasing_id is
    // pid·2³³ + in-partition index, and the checkpointed sorted order is
    // stable, so the low 33 bits ARE the local rank — one narrow pass.
    val local = ranged
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lrn", pmod(monotonically_increasing_id(), lit(1L << 33)) + 1)
    val cumw = Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("__pid")).count()
      .withColumn("__off", coalesce(sum(col("count")).over(cumw), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), "__pid")
      .withColumn("rank", col("__lrn") + col("__off"))
      .drop("__pid", "__lrn", "__off")
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
