package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` bridge: construct a DataFrame from a custom
  * LogicalPlan. This is the standard extension-library idiom (Delta,
  * Sedona, Iceberg all ship an `org.apache.spark.sql.*` shim for exactly
  * this) — the only Spark-internal surface touched is `Dataset.ofRows`.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
