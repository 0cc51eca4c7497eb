package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ↔ Expression converters — the
  * supported pattern for libraries that ship native Catalyst
  * expressions (Spark 4 moved Column onto ColumnNode, so
  * `new Column(expr)` no longer exists).
  */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
