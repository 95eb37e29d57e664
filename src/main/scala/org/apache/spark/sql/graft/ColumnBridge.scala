package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between `Column` (public API) and Catalyst `Expression`
  * (internal) — Spark 4 made the direct constructor private, so
  * extension libraries route through `sql.classic.ExpressionUtils`,
  * which is `private[sql]`. Standard extension-library shim.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
