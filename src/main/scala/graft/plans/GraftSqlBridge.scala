package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}

/** Minimal bridge into the `private[sql]` Dataset constructor so graft's
  * custom logical plans (graft.plans.GroupedTopK) can be wrapped as
  * DataFrames. Lives in the org.apache.spark.sql namespace solely for
  * access; no Spark internals are modified. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
