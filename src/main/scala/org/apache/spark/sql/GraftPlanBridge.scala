package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Plan-level accessors for the whole-operator Catalyst tier (the
  * companion to [[GraftRegistryBridge]]): `Dataset.ofRows`, the
  * analyzed plan, and `experimental` live on the classic session/
  * dataset as `private[sql]` or classic-only members, so the three
  * one-line accessors third-party plan construction needs live in this
  * package — same standard technique as the column/registry bridges. */
object GraftPlanBridge {

  /** The analyzed logical plan behind a DataFrame (resolved attributes,
    * stable exprIds — the form custom logical nodes compose over). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** Wraps a logical plan back into a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The session's experimental-methods registry (extra planner
    * strategies + optimizer rules) for live-session injection. */
  def experimental(spark: SparkSession): ExperimentalMethods =
    spark.asInstanceOf[classic.SparkSession].experimental

  /** The session planner's full strategy list (spec-side visibility:
    * proves `withExtensions` injection without running a query). */
  def plannerStrategies(spark: SparkSession): Seq[execution.SparkStrategy] =
    spark.asInstanceOf[classic.SparkSession].sessionState.planner.strategies
}
