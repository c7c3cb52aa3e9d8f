package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's custom Catalyst expressions.
  *
  * Spark 4 hides the classic `Column(expr)` constructors behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`); the
  * established pattern for extension libraries is a minimal shim in the
  * `org.apache.spark.sql` package that re-exposes exactly what is needed.
  */
object GraftExprBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
