package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 routes Column through ColumnNode (Connect refactor); the
  * classic bridge `ExpressionUtils` is private[sql]. This shim — placed in
  * a subpackage of org.apache.spark.sql, the same pattern libraries like
  * frameless use — re-exports the two conversions the engine needs to
  * register custom Catalyst expressions as Columns. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
