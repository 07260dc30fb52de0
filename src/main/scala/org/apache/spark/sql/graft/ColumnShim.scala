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

  /** EAGER Column→Expression conversion. [[expression]] wraps the
    * Column's node graph in a lazy `ColumnNodeExpression` leaf, which is
    * fine inside Dataset API calls (the session converts it during
    * analysis) but OPAQUE when returned from a `FunctionBuilder` — the
    * analyzer never looks inside and codegen dies on the wrapper. SQL
    * function registration (graft.sql.GraftSql) therefore converts
    * eagerly: the returned tree is plain Catalyst expressions
    * (UnresolvedFunction children included, which the analyzer then
    * resolves normally).
    */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
