package org.apache.spark.sql.graftshim

import java.util.OptionalLong

import org.apache.spark.sql.classic
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder, Statistics, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * The manifest-fed Parquet scan, upgraded with the two DSv2 planner
 * integrations a 100 TB table needs (both powered by metadata the manifest
 * already holds — zero extra I/O):
 *
 *  - **Exact statistics** ([[SupportsReportStatistics]]): byte size from the
 *    pruned file listing and the EXACT row count from manifest stats, so
 *    join planning (broadcast thresholds, AQE re-plans) sees the truth
 *    instead of a compression-factor guess. Iceberg reports the same way.
 *
 *  - **Runtime filtering** ([[SupportsRuntimeV2Filtering]], Iceberg's
 *    `SparkBatchQueryScan.filter` equivalent): when this table is the probe
 *    side of a broadcast join, Spark re-offers the build side's key set as
 *    an IN predicate AFTER planning; whole files provably outside it are
 *    dropped — by PK range ∧ bloom, column [min,max] stats, or the
 *    transform-reversed partition value — before the batch re-plans. A
 *    dimension-filtered fact-table join then reads only the fact files the
 *    surviving dimension keys can live in (DPP semantics without Hive-style
 *    partition columns).
 *
 * The wrapped [[ParquetScan]] is untouched: `FileScan.partitions` is
 * recomputed per `planInputPartitions` call, so installing the runtime
 * filter on the shared [[ManifestFileIndex]] is all the re-planning needs.
 */
final class GraftScan(inner: ParquetScan, index: ManifestFileIndex, rowCount: Long)
  extends Scan with SupportsReportStatistics with SupportsRuntimeV2Filtering {

  override def readSchema(): StructType = inner.readSchema()
  override def description(): String = "Graft " + inner.description()
  override def toBatch: Batch = inner.toBatch
  override def supportedCustomMetrics(): Array[CustomMetric] = inner.supportedCustomMetrics()
  override def reportDriverMetrics(): Array[CustomTaskMetric] = inner.reportDriverMetrics()
  override def columnarSupportMode(): Scan.ColumnarSupportMode = inner.columnarSupportMode()

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong = OptionalLong.of(math.max(1L, index.sizeInBytes))
    override def numRows(): OptionalLong =
      if (rowCount >= 0L) OptionalLong.of(rowCount) else OptionalLong.empty()
  }

  override def filterAttributes(): Array[NamedReference] = {
    // Spark resolves these against the COLUMN-PRUNED relation output — a
    // prunable column not in this scan's projection would fail resolution
    // (join keys are always projected, so nothing of value is lost).
    val out = inner.readSchema().fieldNames
      .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    index.prunableColumns
      .filter(c => out.contains(c.toLowerCase(java.util.Locale.ROOT)))
      .map(Expressions.column).toArray
  }

  override def filter(predicates: Array[Predicate]): Unit = {
    index.applyRuntimeFilter(predicates)
    ()
  }
}

/** Delegating builder: pushdown (column pruning, catalyst filters,
  * aggregates) forwards to the wrapped [[ParquetScanBuilder]]; `build()`
  * wraps the result in [[GraftScan]]. Composition, not inheritance —
  * `ParquetScanBuilder.build()` narrows its return type to `ParquetScan`,
  * which an overriding wrap cannot satisfy. When an aggregate was pushed
  * into the scan the row count no longer describes the scan OUTPUT, so the
  * wrap (and its stats) is skipped — the plain ParquetScan passes through. */
final class GraftScanBuilder(inner: ParquetScanBuilder, index: ManifestFileIndex,
    rowCount: Long)
  extends ScanBuilder
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
  with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  private var aggPushed = false

  override def build(): Scan =
    if (aggPushed) inner.build() else new GraftScan(inner.build(), index, rowCount)

  override def pruneColumns(requiredSchema: StructType): Unit =
    inner.pruneColumns(requiredSchema)

  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    inner.pushFilters(filters)

  override def pushedFilters: Array[Predicate] = inner.pushedFilters

  override def pushAggregation(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    aggPushed = inner.pushAggregation(aggregation)
    aggPushed
  }

  override def supportCompletePushDown(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = inner.supportCompletePushDown(aggregation)
}

object GraftScanBuilder {
  /** Manifest-pruned scan builder with exact stats + runtime filtering (the
    * SQL catalog's batch read path). `rowCount < 0` = unknown. */
  def apply(spark: org.apache.spark.sql.SparkSession, schema: StructType,
      entries: Seq[ManifestEntry], pk: String, options: CaseInsensitiveStringMap,
      pkHashed: Boolean, rowCount: Long): ScanBuilder = {
    val index = new ManifestFileIndex(spark, entries, pk, pkHashed)
    new GraftScanBuilder(
      ParquetScanBuilder(spark.asInstanceOf[classic.SparkSession], index,
        schema, schema, options),
      index, rowCount)
  }
}
