package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Spark 4 keeps `Dataset.ofRows` (LogicalPlan -> DataFrame) `private[sql]`
  * in the classic implementation. Like [[ColumnBridge]], this re-exports the
  * ONE conversion a library planting a custom logical node needs — the
  * documented subpackage escape hatch, nothing else leaks. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
