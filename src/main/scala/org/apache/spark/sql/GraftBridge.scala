package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column ↔ Expression
  * converters, so graft's native Catalyst expressions (e.g.
  * `graft.functions.DotProduct`) can be exposed as user-facing Columns.
  * Standard extension-library pattern: nothing here but the two
  * delegating calls.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
