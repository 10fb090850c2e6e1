package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the classic Column internals (`private[sql]` in Spark 4)
  * so the graft library can expose custom Catalyst expressions as
  * `Column`s — the standard pattern for out-of-tree Spark extensions. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
