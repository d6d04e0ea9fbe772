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
}
