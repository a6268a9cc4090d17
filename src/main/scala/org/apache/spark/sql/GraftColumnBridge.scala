package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for Spark 4's ColumnNode-backed Column
  * (the accessor third-party libraries need to attach native Catalyst
  * expressions; `classic.ExpressionUtils` is `private[sql]`, so the
  * bridge lives in this package — the standard technique used across
  * the open-source Spark-extension ecosystem). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
