package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal accessors for `private[sql]` Spark internals the engine needs
  * (pattern: public-code snippet `[L SNIPPETS.md:64-96]` — package objects in
  * `org.apache.spark.sql` to reach package-private factory methods).
  *
  *  - Column <-> catalyst Expression bridging (Spark 4 Columns wrap ColumnNodes,
  *    not Expressions; `classic.ExpressionUtils` is private[sql]).
  *  - `AbstractDataType` re-export so custom expressions outside the sql package
  *    can implement `ExpectsInputTypes`.
  */
object graftshim {
  type AbstractDT = org.apache.spark.sql.types.AbstractDataType

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame over an RDD of catalyst InternalRows (optimization r6):
    * `createDataFrame(RDD[Row])` drags every row through the external
    * Row/encoder conversion — for narrow per-partition kernels that read
    * and emit millions of rows (sorted-neighborhood successor pass), the
    * object-domain hop tripled the stage's per-row cost (noop-sink A/B on
    * 4.1.2). `internalCreateDataFrame` is `private[sql]`, hence this shim.
    */
  def internalCreateDataFrame(
      spark: SparkSession,
      rows: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rows, schema)
}
