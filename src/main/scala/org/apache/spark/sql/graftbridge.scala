package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's sql-private Column↔Expression conversions (Spark 4
  * moved `Column.expr` behind the classic module). Lives in the
  * org.apache.spark.sql package solely to access `private[sql]` scope.
  */
object graftbridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
