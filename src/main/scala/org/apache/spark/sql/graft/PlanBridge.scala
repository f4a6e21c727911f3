package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge into the `private[sql]` Dataset constructor — the one hop a
  * third-party whole-operator extension needs that
  * `SparkSessionExtensions` does not expose: turning a custom resolved
  * `LogicalPlan` node (graft.plans.AsofJoinNode) back into a public
  * `DataFrame`. Lives under `org.apache.spark.sql` solely to satisfy the
  * access scope; contains no Spark code.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
