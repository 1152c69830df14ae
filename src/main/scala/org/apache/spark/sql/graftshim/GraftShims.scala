package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal bridge to `private[sql]` Spark internals (the standard table-format
  * technique — Delta/Iceberg ship equivalent shims): build a DataFrame from an
  * analyzed LogicalPlan (GraftMergeExec) and wrap a custom catalyst Expression
  * as a Column (graft.functions). */
object GraftShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Analyzed logical plan of a DataFrame (for plan substitution in rules). */
  def planOf(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]].queryExecution.analyzed

  /** Spark's Hive-style partition-path unescaper (`_p=a%20b` → `a b`). */
  def unescapePathName(s: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName(s)

  /** InternalRow RDD of a DataFrame's physical plan (streaming sink
    * materialization: rows must be copied + cached so the micro-batch plan
    * executes once, not once per engine pass). */
  def toInternalRdd(df: DataFrame)
      : org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] =
    df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]].queryExecution.toRdd

  /** Rebuild a batch DataFrame over an InternalRow RDD (`internalCreateDataFrame`
    * is `private[sql]`). */
  def internalCreateDataFrame(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)

  /** First integer literal argument of a DSv2 Transform (the bucket count of
    * `bucket(n, col)`). LiteralValue is `private[sql]`, hence shimmed here. */
  def transformLiteralInt(t: org.apache.spark.sql.connector.expressions.Transform): Option[Int] =
    t.arguments().collectFirst {
      case org.apache.spark.sql.connector.expressions.LiteralValue(v: Integer, _) =>
        v.intValue()
      case org.apache.spark.sql.connector.expressions.LiteralValue(v: java.lang.Long, _) =>
        v.intValue()
    }
}
