package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst Expression bridge.
  *
  * Spark 4 moved the Expression-backed Column constructor behind
  * `private[sql]` converters (`classic.ExpressionUtils`); extension
  * libraries reach them from inside the `org.apache.spark.sql`
  * package. This is the only file outside the `graft` namespace.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
