package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Bridge into `private[sql]` surface: wrap a Catalyst [[Expression]] as a
  * user-facing [[Column]] and reach the session's [[FunctionRegistry]].
  * Spark 4.x removed the public `new Column(expr)` constructor (Column is
  * plan-agnostic now); `classic.ExpressionUtils` is the supported internal
  * path for extension libraries that ship their own expressions.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  def functionRegistry(spark: SparkSession): FunctionRegistry =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry

  /** Block until every queued listener-bus event has been delivered —
    * lets a test assert "no job was launched" deterministically instead
    * of sleeping a wall-clock guess (flaky both ways under load). */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
