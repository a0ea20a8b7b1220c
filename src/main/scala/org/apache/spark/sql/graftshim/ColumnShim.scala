package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters so
  * graft's native Catalyst expressions can surface as ordinary
  * `Column`s. Lives under `org.apache.spark.sql` purely for access —
  * the same technique Spark connector libraries use; only public Spark
  * source knowledge involved.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Column → Expression via the classic converter, which recursively
    * rewrites the Column-node tree into catalyst expressions
    * (functions become `UnresolvedFunction`s the analyzer resolves).
    * `ExpressionUtils.expression`'s lazy `ColumnNodeExpression` wrapper
    * only converts on Dataset API paths — handed to other surfaces
    * (e.g. a SQL FunctionBuilder) it reaches codegen unconverted and
    * throws `Unevaluable`.
    */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
