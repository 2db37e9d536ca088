package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's private[sql] Column <-> Expression conversions
  * (Spark 4 wraps Column around ColumnNode rather than Expression).
  * Lives under org.apache.spark.sql.* solely for visibility — the
  * standard technique for libraries that register custom Catalyst
  * expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Rebind a frame's logical plan to `session` (typically a
    * `newSession()` clone sharing the SparkContext and catalog but with
    * ISOLATED SQLConf), so an operator can plan/execute under temporary
    * conf overrides without ever mutating the caller's session — a
    * concurrent query on the original session can never observe the
    * overrides.
    *
    * Restriction: `newSession()` also has an ISOLATED temp-view
    * registry, so a plan that still contains an unresolved reference to
    * a temp view of the parent session fails re-analysis here. Resolve
    * such frames before rebinding (a `DataFrame` read from files or
    * already-analyzed relations is fine); callers copying runtime conf
    * into the clone (see Contamination.flagContaminatedBloom) keep
    * planner behavior identical but do NOT import temp views. */
  def inSession(session: SparkSession, df: DataFrame): DataFrame =
    classic.Dataset.ofRows(session.asInstanceOf[classic.SparkSession],
      df.asInstanceOf[classic.Dataset[_]].queryExecution.logical)
}
