package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native expressions.
  *
  * Spark 4 hides the classic `Column(expr)` constructor behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`,
  * columnNodeSupport.scala), so libraries adding custom Catalyst
  * expressions need one object inside the `org.apache.spark.sql`
  * namespace to re-expose it — the same technique every Spark-native
  * extension library uses. This is the ONLY place graft touches a
  * Spark-private API; everything else is the public DataFrame surface.
  * (The registry route, [[graft.plans.MinHashSig.register]], remains the
  * path for SQL-text callers; this one serves Column-API call sites that
  * must embed driver-computed models in the expression node itself.) */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
