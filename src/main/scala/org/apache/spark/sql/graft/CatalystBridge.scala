package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `private[sql]` seams needed when defining custom Catalyst
  * expressions outside Spark's source tree — the Column ⇄ Expression
  * conversions that Spark 4 classic keeps internal. Lives under
  * `org.apache.spark.sql` purely for access; no Spark code is modified.
  */
object CatalystBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over a custom LogicalPlan — `Dataset.ofRows` is
    * `private[sql]` in Spark 4 classic. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Apply a `SparkSessionExtensions` function set to a LIVE session's
    * registry — what `spark.sql.extensions` does at session build, made
    * testable without tearing down the shared test session. */
  def installFunctions(
      ext: org.apache.spark.sql.SparkSessionExtensions,
      spark: org.apache.spark.sql.SparkSession): Unit =
    ext.registerFunctions(spark.sessionState.functionRegistry)
}
