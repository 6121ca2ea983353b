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

  /** Apply an extensions module's FUNCTION injections to an already-built
    * session (`SparkSessionExtensions.registerFunctions` is
    * `private[sql]`, reachable from this subpackage). The config path
    * (`spark.sql.extensions=graft.GraftExtensions`) binds at session
    * build; this is the attach-later door for sessions the library
    * didn't build — a shared notebook session, a test harness. */
  def attachFunctions(spark: org.apache.spark.sql.SparkSession,
                      module: org.apache.spark.sql.SparkSessionExtensions => Unit): Unit = {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    module(ext)
    ext.registerFunctions(spark.sessionState.functionRegistry)
  }
}
