package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal bridge to `private[sql]` Spark internals (the standard table-format
  * technique — Delta/Iceberg ship equivalent shims). Only what GraftMergeExec
  * needs: build a DataFrame from an analyzed LogicalPlan. */
object GraftShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
