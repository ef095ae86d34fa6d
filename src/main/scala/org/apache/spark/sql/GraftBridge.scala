package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters.
  *
  * Spark 4 moved Column onto ColumnNode (SPARK-46960); the supported way for
  * a library to expose a custom Catalyst `Expression` as a user-facing
  * `Column` is `classic.ExpressionUtils`, which is `private[sql]` — hence
  * this one-file shim in the org.apache.spark.sql package (the same trick
  * spark-excel / frameless use). No other file may live in this package.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
