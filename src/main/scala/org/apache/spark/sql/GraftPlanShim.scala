package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the `private[sql]` Dataset.ofRows, for constructing a
  * DataFrame directly from a custom logical operator (e.g.
  * [[graft.plans.TopKPerGroup]]) without routing through an optimizer
  * rewrite — the standard shim every Spark extension library ships to
  * surface its own plan nodes through the public Dataset API. */
object GraftPlanShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): Dataset[Row] =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
