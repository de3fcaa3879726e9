package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` surface: turning a hand-built (already
  * resolved) `LogicalPlan` into a `DataFrame`. Lives under
  * `org.apache.spark.sql` for access, same as every Spark extension
  * library that plans custom logical nodes (the public API offers no
  * constructor from a LogicalPlan by design). */
object GraftSql {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Column ⇄ Expression bridge (both `private[sql]` in Spark 4): lets
    * library functions return native-Expression-backed Columns without a
    * function-registry round-trip (no SparkSession needed at call site). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
