package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal Expression <-> Column bridge. Spark 4 made Column a wrapper over
  * ColumnNode with the conversions `private[sql]`; third-party expression
  * libraries bridge through an `org.apache.spark.sql` subpackage (the same
  * pattern used by public projects, cf. SNIPPETS.md [2][3]). Kept to two
  * one-liners so the private-API surface stays auditable.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** LogicalPlan -> DataFrame (Dataset.ofRows is `private[sql]`) — needed
    * to hang a custom logical operator under the public Dataset API.
    */
  def dataFrame(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** DataFrame -> analyzed LogicalPlan. */
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].logicalPlan
}
