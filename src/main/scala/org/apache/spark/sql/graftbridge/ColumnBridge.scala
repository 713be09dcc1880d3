package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column↔Expression conversion private[sql]
  * (org.apache.spark.sql.classic.ExpressionUtils). This is the minimal
  * sanctioned escape hatch for libraries shipping custom Catalyst
  * expressions: a bridge object inside the org.apache.spark.sql package.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
