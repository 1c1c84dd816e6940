package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Dataset constructor — the standard
  * extension-library technique (Delta, Iceberg, Sedona all ship classes in
  * the org.apache.spark.sql namespace for exactly this): a custom
  * LogicalPlan node can only become a user-facing DataFrame through
  * `Dataset.ofRows`. This is the single place the graft library reaches
  * across that boundary.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
