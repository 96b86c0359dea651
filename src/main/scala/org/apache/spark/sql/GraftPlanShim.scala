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

  /** Bridge to the `private[sql]` Column-from-Expression constructor —
    * for custom expressions whose arguments are not SQL-expressible
    * (e.g. [[graft.functions.CentroidSqDists]]'s codebook matrix), which
    * therefore can't route through the function registry + `expr(...)`. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Inverse bridge: the (possibly unresolved) Catalyst expression a
    * public Column wraps — for feeding a column into a custom
    * expression's child slot. */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
