package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 moved `Column` to a plan-agnostic API; wrapping a raw catalyst
  * `Expression` goes through `classic.ExpressionUtils`, which is
  * `private[sql]` — hence this one-file subpackage of org.apache.spark.sql
  * (the standard extension-point pattern; no Spark internals are modified).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
