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

  /** Re-root a DataFrame's logical plan onto another session of the same
    * SparkContext (`Dataset.ofRows` is private[sql]) — used to start a
    * pre-built streaming frame under a cloned session so its per-stream
    * conf (state-store fan-out) never mutates the shared session.
    */
  def rebind(df: org.apache.spark.sql.DataFrame,
      s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.queryExecution.logical)

  /** [[rebind]] over the ANALYZED plan — required when the plan contains
    * references only the source session can resolve (a temp view such as
    * a memory-sink table): analysis binds them to concrete relations
    * first, which then evaluate on any session of the same context.
    */
  def rebindAnalyzed(df: org.apache.spark.sql.DataFrame,
      s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.queryExecution.analyzed)
}
