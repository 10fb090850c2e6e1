package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.DataType

/** Bridge into Spark's `private[sql]` Column constructor — the same
  * one-forwarding-object pattern as [[StreamBridge]].
  *
  * A DataSource V2 `LiteralValue` carries its value in CATALYST-
  * INTERNAL representation (UTF8String for strings, Decimal, days/
  * micros for dates/timestamps); the public `functions.lit` expects
  * EXTERNAL values, so round-tripping through it would corrupt exactly
  * the types a DELETE predicate most often compares. The catalyst
  * `Literal(value, dataType)` constructor takes the internal form
  * directly, and `ExpressionUtils.column` (private[sql]) wraps it. */
object ExprBridge {

  /** A catalyst-internal `value` of `dataType` as a Column literal. */
  def internalLiteral(value: Any, dataType: DataType): Column =
    ExpressionUtils.column(Literal(value, dataType))
}
