package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Bridge between the public Column API and Catalyst Expressions.
  *
  * Spark 4 moved the Column↔Expression converters behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`,
  * columnNodeSupport.scala); extension libraries that register native
  * (non-UDF) functions into the FunctionRegistry need exactly these two
  * hooks, so we expose them from a package nested under the sql
  * namespace — the same technique Spark's own connectors use. No Spark
  * internals are reimplemented here.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** EAGER conversion (ColumnNodeToExpressionConverter), not the lazy
    * ColumnNodeExpression wrapper from ExpressionUtils.expression: a
    * FunctionRegistry builder splices its result straight into a parsed
    * plan, where a lazy wrapper would survive to execution unresolved. */
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter.apply(c.node)
}
