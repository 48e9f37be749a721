package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 unified the Column API and made the classic
  * Column↔Expression converters `private[sql]`; custom Catalyst
  * expressions still need them to surface as Columns. This bridge lives
  * under `org.apache.spark.sql` purely to re-export the two converters —
  * the standard extension-library pattern.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
