package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's private[sql] Column <-> Expression conversions
  * (org.apache.spark.sql.classic.ExpressionUtils), so graft's native
  * Catalyst expressions can be exposed as Columns without depending on
  * further internals. Lives in org.apache.spark.sql purely for access;
  * contains no logic.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
