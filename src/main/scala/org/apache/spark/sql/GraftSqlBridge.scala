package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` bridge for graft's custom plan nodes: the only
  * supported way to wrap a hand-built LogicalPlan into a DataFrame is
  * `classic.Dataset.ofRows`, which is package-private to org.apache.spark.sql
  * — the standard extension-library workaround is this one-file shim living
  * in that package. No other internals are touched.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** An isolated copy of the session (shared context, independent runtime
    * conf — inherited, then divergeable): Spark 4 moved `cloneSession`
    * onto the classic implementation only, and `newSession()` would DROP
    * runtime conf already set on the parent. Used by gates that must flip
    * session-global settings (state-store provider) without racing
    * concurrently-running catalog neighbors. */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()
}
