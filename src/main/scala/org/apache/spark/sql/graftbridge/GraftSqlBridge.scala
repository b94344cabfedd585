package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` surface needed by custom Catalyst expressions:
  * Spark 4 Columns wrap `ColumnNode`s, and the classic-API converter
  * (`org.apache.spark.sql.classic.ExpressionUtils`) is package-private.
  * Living inside `org.apache.spark.sql` is the standard extension-library
  * technique for this (same approach as frameless / spark-daria).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
