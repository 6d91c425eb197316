package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ⇄ Expression converters.
  * Custom Catalyst expressions need `Expression → Column` to be exposed as a
  * user API; Spark 4 moved the constructor behind `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils), so this one-file shim
  * lives in the sql package — the conventional technique for Catalyst
  * extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
