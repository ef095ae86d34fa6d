package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters.
  *
  * Spark 4 moved Column onto ColumnNode (SPARK-46960); the supported way for
  * a library to expose a custom Catalyst `Expression` as a user-facing
  * `Column` is `classic.ExpressionUtils`, which is `private[sql]` — hence
  * this one-file shim in the org.apache.spark.sql package (the same trick
  * spark-excel / frameless use). No other file may live in this package.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a custom LogicalPlan as a DataFrame (classic.Dataset.ofRows is
    * `private[sql]`). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The logical plan behind a DataFrame. */
  def logicalPlan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].logicalPlan

  /** Idempotently install a planner strategy into a session (the
    * session-local twin of SparkSessionExtensions.injectPlannerStrategy —
    * usable on an already-built session). */
  def installStrategy(spark: SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(strategy)) {
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ strategy
    }
  }

  /** Idempotently install an optimizer rule into a session (the
    * session-local twin of SparkSessionExtensions.injectOptimizerRule). */
  def installOptimizerRule(spark: SparkSession,
      rule: org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraOptimizations.contains(rule)) {
      cs.experimental.extraOptimizations = cs.experimental.extraOptimizations :+ rule
    }
  }
}
