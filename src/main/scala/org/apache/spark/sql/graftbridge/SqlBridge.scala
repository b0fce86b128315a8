package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved Column off Expression (ColumnNode); the converters live in
  * `private[sql]` ExpressionUtils. This bridge re-exports just the two
  * conversions custom Catalyst expressions need, from inside the sql
  * package namespace — the standard pattern for Catalyst extension libs.
  */
object SqlBridge {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
