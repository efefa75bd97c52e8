package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column↔Expression converters,
  * so graft's native Catalyst expressions (graft.sql.CosineSim) can be
  * used as Columns without SQL-registry indirection. This is the
  * standard extension-library shim — nothing else in the repo lives in
  * the org.apache.spark namespace.
  */
object GraftSqlBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
