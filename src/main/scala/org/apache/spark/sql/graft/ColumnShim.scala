package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column↔Expression converters (Spark 4
  * removed the public `Column(expr)` constructor). Lives inside the
  * `org.apache.spark.sql` namespace on purpose — the standard pattern for
  * Catalyst extensions that expose custom Expressions as Columns.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
