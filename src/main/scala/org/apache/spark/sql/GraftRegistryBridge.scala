package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Registry accessor for live sessions (the companion to
  * [[GraftColumnBridge]]): `sessionState` is `private[sql]` on the
  * classic SparkSession, so the one-line accessor third-party function
  * registration needs lives in this package — same standard technique
  * as the column bridge. */
object GraftRegistryBridge {
  def functionRegistry(spark: SparkSession): FunctionRegistry =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry

  /** The table-valued-function registry (the `range(...)`-style FROM
    * clause surface) — the live-session registration path for the
    * engine's whole-operator TVFs (`graft_asof`, `graft_range_join`). */
  def tableFunctionRegistry(spark: SparkSession)
      : org.apache.spark.sql.catalyst.analysis.TableFunctionRegistry =
    spark.asInstanceOf[classic.SparkSession].sessionState.tableFunctionRegistry
}
