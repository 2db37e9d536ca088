package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's private[sql] Column <-> Expression conversions
  * (Spark 4 wraps Column around ColumnNode rather than Expression).
  * Lives under org.apache.spark.sql.* solely for visibility — the
  * standard technique for libraries that register custom Catalyst
  * expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
