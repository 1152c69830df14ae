package org.apache.spark.sql.graftshim

import java.util.OptionalLong

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read.SupportsReportPartitioning
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
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
final class GraftScan(inner: ParquetScan, index: ManifestFileIndex, rowCount: Long,
    /** `Some((n, col))` when the table is bucket-partitioned under ONE spec
      * for every live file: the scan then reports KeyGroupedPartitioning over
      * `bucket(n, col)` and plans one keyed input partition per bucket —
      * storage-partitioned joins (SPJ): two co-bucketed tables joining on the
      * bucket column need NO shuffle exchange (Iceberg's SPJ design). */
    bucketSpec: Option[(Int, String)] = None,
    /** Lower-cased column → recorded HLL NDV (graft.table.NdvStats, the
      * `CALL system.analyze` output) — feeds CBO's distinctCount. */
    ndv: Map[String, Long] = Map.empty)
  extends Scan with SupportsReportStatistics with SupportsRuntimeV2Filtering
  with SupportsReportPartitioning {

  /** SPJ applies only when (a) the session opted into DSv2 bucketing —
    * with the conf off Spark ignores the reported partitioning, and keyed
    * per-bucket planning would only collapse the scan to `n` unsplittable
    * tasks for zero benefit — and (b) the (column-pruned) output still
    * carries the bucket column: Spark resolves the reported transform
    * against the scan output, and an unresolvable reference would fail the
    * query rather than degrade. */
  private def activeBucketSpec: Option[(Int, String)] = bucketSpec.filter { case (_, c) =>
    org.apache.spark.sql.internal.SQLConf.get.v2BucketingEnabled &&
      inner.readSchema().fieldNames.exists(_.equalsIgnoreCase(c))
  }

  override def outputPartitioning(): Partitioning = activeBucketSpec match {
    case Some((n, col)) =>
      new KeyGroupedPartitioning(Array(Expressions.bucket(n, col)), n)
    case None => new UnknownPartitioning(0)
  }

  override def readSchema(): StructType = inner.readSchema()
  override def description(): String = "Graft " + inner.description()
  override def toBatch: Batch =
    if (activeBucketSpec.isDefined) new GraftKeyedBatch(inner.toBatch)
    else inner.toBatch
  override def supportedCustomMetrics(): Array[CustomMetric] = inner.supportedCustomMetrics()
  override def reportDriverMetrics(): Array[CustomTaskMetric] = inner.reportDriverMetrics()
  override def columnarSupportMode(): Scan.ColumnarSupportMode = inner.columnarSupportMode()

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong = OptionalLong.of(math.max(1L, index.sizeInBytes))
    override def numRows(): OptionalLong =
      if (rowCount >= 0L) OptionalLong.of(rowCount) else OptionalLong.empty()
    // Column [min,max] from chunk-merged manifest stats (zero entry loads):
    // under CBO this feeds range-predicate selectivity and join-size
    // estimates. Values are Catalyst-internal representations (Long micros
    // for timestamps, Int days for dates) — exactly what the stats layer
    // stores from parquet footers at write time.
    override def columnStats(): java.util.Map[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
      import org.apache.spark.sql.types._
      val m = new java.util.HashMap[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
      val ranges = index.columnRanges
      inner.readSchema().fields.foreach { f =>
        val key = f.name.toLowerCase(java.util.Locale.ROOT)
        val mm: Option[(AnyRef, AnyRef)] = ranges.get(key).flatMap { case (lo, hi) =>
          f.dataType match {
            case LongType | TimestampType => Some((Long.box(lo), Long.box(hi)))
            case IntegerType | DateType => Some((Int.box(lo.toInt), Int.box(hi.toInt)))
            case ShortType => Some((Short.box(lo.toShort), Short.box(hi.toShort)))
            case ByteType => Some((Byte.box(lo.toByte), Byte.box(hi.toByte)))
            case _ => None
          }
        }
        // NDV is type-agnostic (string join keys get cardinality too); a
        // column may carry either or both
        val dc = ndv.get(key)
        if (mm.isDefined || dc.isDefined) {
          m.put(Expressions.column(f.name),
            new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
              override def min(): java.util.Optional[Object] =
                mm.fold(java.util.Optional.empty[Object]())(v => java.util.Optional.of(v._1))
              override def max(): java.util.Optional[Object] =
                mm.fold(java.util.Optional.empty[Object]())(v => java.util.Optional.of(v._2))
              override def distinctCount(): OptionalLong =
                dc.fold(OptionalLong.empty())(OptionalLong.of)
            })
        }
      }
      m
    }
  }

  override def filterAttributes(): Array[NamedReference] = {
    // Spark resolves these against the COLUMN-PRUNED relation output — a
    // prunable column not in this scan's projection would fail resolution
    // (join keys are always projected, so nothing of value is lost).
    // Besides the chunk-advertised columns, every stats-ELIGIBLE schema
    // column (integral/timestamp/date — the types the write path extracts
    // footer stats for) is advertised: chunk-merged stats are the
    // intersection of per-file keys, so a column tracked by most-but-not-all
    // files would otherwise vanish from advertising and lose the per-entry
    // pruning those files still support. Over-advertising is safe — a file
    // without stats for a filtered column simply never prunes.
    val statEligible = inner.readSchema().fields.collect {
      case f if (f.dataType match {
        case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.TimestampType | org.apache.spark.sql.types.DateType =>
          true
        case _ => false
      }) => f.name
    }
    val out = inner.readSchema().fieldNames
      .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    (index.prunableColumns ++ statEligible)
      .map(_.toLowerCase(java.util.Locale.ROOT)).distinct
      .filter(out.contains)
      .map(Expressions.column).toArray
  }

  override def filter(predicates: Array[Predicate]): Unit = {
    index.applyRuntimeFilter(predicates)
    ()
  }
}

/** A [[FilePartition]] that also names its bucket — Spark groups
  * key-carrying partitions into catalyst KeyGroupedPartitioning, the basis
  * of exchange-free co-bucketed joins. */
final class KeyedFilePartition(index0: Int, files0: Array[PartitionedFile],
    key: InternalRow) extends FilePartition(index0, files0) with HasPartitionKey {
  override def partitionKey(): InternalRow = key
}

/**
 * Regroups the inner ParquetScan's planned files into ONE input partition
 * per bucket, keyed by the bucket id parsed from the file path's `_p=<id>`
 * directory (the write path stamps every data file into its bucket
 * directory, so the id is planning metadata — no file is opened). Falls
 * back to the inner partitions verbatim if any file lacks a bucket id
 * (partitions then carry no keys and Spark plans a normal shuffle join).
 */
private[graftshim] final class GraftKeyedBatch(inner: Batch) extends Batch {
  private val BucketDir = ".*/_p=([0-9]+)/[^/]*$".r

  override def planInputPartitions(): Array[InputPartition] = {
    val parts = inner.planInputPartitions()
    val files = Array.newBuilder[PartitionedFile]
    parts.foreach {
      case fp: FilePartition => files ++= fp.files
      case _ => return parts
    }
    val keyed = files.result().map { f =>
      f.filePath.toString match {
        case BucketDir(b) => (b.toInt, f)
        case _ => return parts
      }
    }
    keyed.groupBy(_._1).toArray.sortBy(_._1).zipWithIndex.map {
      case ((b, fs), i) => new KeyedFilePartition(i, fs.map(_._2), InternalRow(b))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = inner.createReaderFactory()
}

/** Delegating builder: pushdown (column pruning, catalyst filters,
  * aggregates) forwards to the wrapped [[ParquetScanBuilder]]; `build()`
  * wraps the result in [[GraftScan]]. Composition, not inheritance —
  * `ParquetScanBuilder.build()` narrows its return type to `ParquetScan`,
  * which an overriding wrap cannot satisfy. When an aggregate was pushed
  * into the scan the row count no longer describes the scan OUTPUT, so the
  * wrap (and its stats) is skipped — the plain ParquetScan passes through. */
final class GraftScanBuilder(inner: ParquetScanBuilder, index: ManifestFileIndex,
    rowCount: Long, bucketSpec: Option[(Int, String)] = None,
    ndv: Map[String, Long] = Map.empty)
  extends ScanBuilder
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
  with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  private var aggPushed = false

  override def build(): Scan =
    if (aggPushed) inner.build()
    else new GraftScan(inner.build(), index, rowCount, bucketSpec, ndv)

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
      pkHashed: Boolean, rowCount: Long,
      bucketSpec: Option[(Int, String)] = None,
      ndv: Map[String, Long] = Map.empty): ScanBuilder = {
    val index = new ManifestFileIndex(spark, ManifestFileIndex.chunksOf(entries),
      pk, pkHashed)
    new GraftScanBuilder(
      ParquetScanBuilder(spark.asInstanceOf[classic.SparkSession], index,
        schema, schema, options),
      index, rowCount, bucketSpec, ndv)
  }
}
