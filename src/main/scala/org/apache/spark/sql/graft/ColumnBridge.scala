package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's custom Catalyst expressions.
  *
  * Spark 4 made the public `Column` a thin wrapper over `ColumnNode` and
  * hid the classic expression plumbing behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Extensions that add
  * native expressions (graft.functions.VectorDot) still need the bridge,
  * so this one-file shim lives in the sql namespace — the same technique
  * every out-of-tree Spark connector/extension uses.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
