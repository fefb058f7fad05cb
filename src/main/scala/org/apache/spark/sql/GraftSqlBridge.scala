package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column <-> catalyst Expression converters.
  * Spark 4 hid these behind the Connect-compatible Column API; placing a
  * forwarder inside the org.apache.spark.sql package is the standard
  * technique for libraries that ship custom Catalyst expressions.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
