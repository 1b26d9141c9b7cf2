package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Bridge to the `private[sql]` Column <-> Expression converters so graft
  * can register native Catalyst expressions without forking Spark. This
  * is the standard extension-library idiom: a single file placed under
  * `org.apache.spark.sql` exposing exactly the two conversions.
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Column → Expression through the FULL ColumnNode converter: unlike
    * `expression` (which may hand back a lazy ColumnNodeExpression
    * wrapper that only Dataset API boundaries unwrap), this eagerly
    * converts the whole node tree into a genuine Catalyst expression
    * tree — the form a FunctionRegistry builder must return, since the
    * analyzer resolves expression children, not column nodes.
    */
  def expressionTree(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
}
