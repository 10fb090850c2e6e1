package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Bridge to the session's `private[sql]` function registry so graft's
  * custom Catalyst expressions are callable from `spark.sql(...)` text —
  * the same registration path `SparkSessionExtensions.injectFunction`
  * uses, but applicable to an already-built session. */
object GraftFunctionBridge {
  def register(spark: SparkSession, name: String, className: String,
               builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name),
        new ExpressionInfo(className, name), builder)
}
