package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the classic Column <-> catalyst Expression conversions,
  * which Spark 4 keeps package-private (`ExpressionUtils` is
  * private[sql]). Compiled into the owning package on purpose — the
  * standard extension-library pattern for registering custom Catalyst
  * expressions without a SparkSessionExtensions round-trip.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
