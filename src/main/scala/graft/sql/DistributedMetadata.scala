package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.table.{ChunkJson, DataFile}

/**
 * Distributed (manifest-fed) entry-level metadata scans — the scale path for
 * `table.files` / `table.entries` / `table.all_files`.
 *
 * The driver-side `LocalRowsTable` materialization of every manifest entry
 * (the pre-round-11 implementation) is a driver-memory and latency wall at
 * 10⁵–10⁷ files; Iceberg serves these tables as distributed metadata scans
 * over its manifests (reference composes the same machinery via
 * `job:59`'s Iceberg extensions). Here each input partition is ONE manifest
 * chunk: planning ships only chunk refs (path + retained-version range,
 * already resolved from manifest JSON with zero entry loads), and the chunk's
 * entries are parsed executor-side by [[ChunkJson]]. Chunk files live under
 * the table root, i.e. on the same shared storage as the data files, so
 * executors can read them wherever the data itself is readable.
 *
 * `files` is served directly (each live file appears in exactly one chunk —
 * no cross-chunk work). `entries` / `all_files` need a per-path aggregate
 * across the retained history (first/last referencing version), which is a
 * genuine shuffle: those resolve to a [[DistributedMetaTable]] placeholder
 * that [[GraftMetadataScanRule]] substitutes during analysis with a
 * `groupBy(path).agg(min/max)` plan over the raw chunk scan — Spark does the
 * aggregation, the driver never holds an entry.
 */
/** One manifest chunk = one input partition. `firstRef`/`lastRef` are the
  * min/max RETAINED snapshot versions whose manifests reference this chunk
  * (driver-computed from manifest JSON chunk-ref lists alone). Since data
  * file paths are write-once and a live file's chunk is always referenced by
  * the snapshot it is live in, `min/max` over a path's chunk occurrences IS
  * the path's retained live version range. `inParent` records whether the
  * PARENT retained snapshot references this chunk — `entries.status` needs
  * exact parent membership, which (first, last) alone loses when a rollback
  * re-adds files after a gap. */
final case class ChunkSlicePartition(chunkPath: String, firstRef: Long, lastRef: Long,
    inParent: Boolean = false,
    /** Chunk-ref stats for planning-time pruning (sentinels = stat-less
      * legacy chunk → never pruned): the chunk's entries have pk_min/pk_max
      * inside [pkMin, pkMax], and `parts` (when present) is the complete
      * partition-value list. */
    pkMin: Long = Long.MinValue, pkMax: Long = Long.MaxValue,
    parts: Option[Seq[String]] = None)
  extends InputPartition

/** Raw per-entry row emission modes. */
object ChunkEntryMode {
  /** `files` schema rows: (path, partition, pk_min, pk_max, n_rows, n_bytes,
    * kind, spec_id). */
  val Files = "files"
  /** history-scan rows feeding entries/all_files aggregation: (path,
    * partition, pk_min, pk_max, n_rows, n_bytes, kind, spec_id, first_ref,
    * last_ref). */
  val Hist = "hist"

  val HistSchema: StructType = StructType(Seq(
    StructField("path", StringType), StructField("partition", StringType),
    StructField("pk_min", LongType), StructField("pk_max", LongType),
    StructField("n_rows", LongType), StructField("n_bytes", LongType),
    StructField("kind", StringType), StructField("spec_id", LongType),
    StructField("first_ref", LongType), StructField("last_ref", LongType),
    StructField("in_parent", LongType)))

  private[sql] def rowOf(mode: String, f: DataFile, p: ChunkSlicePartition): Array[Any] = {
    val base = Array[Any](f.path, f.partition.orNull, f.pkMin, f.pkMax, f.rows, f.bytes,
      "data", f.specId.toLong)
    if (mode == Files) base
    else base ++ Array[Any](p.firstRef, p.lastRef, if (p.inParent) 1L else 0L)
  }
}

/**
 * DSv2 table whose partitions are manifest chunks (plus one local partition
 * for rows the driver already holds: MOR delete inventories and legacy
 * inline-manifest files, both resident in the manifest JSON itself).
 */
class ChunkEntriesTable(tableName: String, tableSchema: StructType, val mode: String,
    slices: Seq[ChunkSlicePartition], inline: Seq[Array[Any]])
  extends Table with SupportsRead {

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownFilters with Scan with Batch {
      private var kept: Seq[ChunkSlicePartition] = slices
      // PRUNE-only pushdown: chunks whose ref stats cannot match any
      // conjunct are dropped at planning; every filter is still evaluated
      // post-scan (pushedFilters stays empty), so pruning only has to be
      // conservative. A metadata query like `files WHERE partition = 'x'`
      // or `WHERE kind LIKE '%-deletes'` over a 10⁷-file table then opens
      // O(matching chunks), not all of them.
      override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
          : Array[org.apache.spark.sql.sources.Filter] = {
        kept = slices.filter(s => filters.forall(f => ChunkEntriesTable.mayMatch(s, f)))
        filters
      }
      override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
        Array.empty
      override def build(): Scan = this
      override def readSchema(): StructType = tableSchema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val chunkParts: Array[InputPartition] = kept.toArray
        if (inline.isEmpty) chunkParts
        else chunkParts :+ LocalRowsPartition(inline.map(_.toIndexedSeq).toIndexedSeq)
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new ChunkEntriesReaderFactory(mode)
    }
}

object ChunkEntriesTable {
  import org.apache.spark.sql.sources._

  /** Conservative chunk-level test: false ONLY when no entry of the chunk
    * can satisfy `f`. Chunk rows always have kind='data' and non-sentinel
    * pk bounds inside the ref's [pkMin, pkMax]. */
  private[sql] def mayMatch(s: ChunkSlicePartition, f: Filter): Boolean = f match {
    case EqualTo("kind", v) => v == "data"
    case In("kind", vs) => vs.contains("data")
    // `kind LIKE '%-deletes'` etc. arrive as string matchers
    case StringStartsWith("kind", v) => "data".startsWith(v)
    case StringEndsWith("kind", v) => "data".endsWith(v)
    case StringContains("kind", v) => "data".contains(v)
    case EqualTo("partition", v) => s.parts.forall(_.contains(String.valueOf(v)))
    case In("partition", vs) =>
      s.parts.forall(p => vs.map(String.valueOf).exists(p.contains))
    case EqualTo(c @ ("pk_min" | "pk_max"), v: Long) => s.pkMin <= v && v <= s.pkMax
    case GreaterThan("pk_min" | "pk_max", v: Long) => s.pkMax > v
    case GreaterThanOrEqual("pk_min" | "pk_max", v: Long) => s.pkMax >= v
    case LessThan("pk_min" | "pk_max", v: Long) => s.pkMin < v
    case LessThanOrEqual("pk_min" | "pk_max", v: Long) => s.pkMin <= v
    case And(l, r) => mayMatch(s, l) && mayMatch(s, r)
    case Or(l, r) => mayMatch(s, l) || mayMatch(s, r)
    case _ => true // unknown shape: keep (filters re-evaluate post-scan)
  }
}

private[sql] class ChunkEntriesReaderFactory(mode: String) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: ChunkSlicePartition =>
        new PartitionReader[InternalRow] {
          private lazy val rows = ChunkJson.parse(p.chunkPath)
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow = new GenericInternalRow(
            ChunkEntryMode.rowOf(mode, rows(i), p).map {
              case s: String => UTF8String.fromString(s)
              case v => v.asInstanceOf[AnyRef]
            }.toArray[Any])
          override def close(): Unit = ()
        }
      case other => new LocalRowsReaderFactory().createReader(other)
    }
}

/**
 * Placeholder for the aggregated metadata tables (`entries`, `all_files`):
 * carries the raw chunk-scan table plus the aggregation parameters;
 * [[GraftMetadataScanRule]] substitutes it during analysis with the
 * distributed `groupBy(path)` plan. Its own scan is a correctness-preserving
 * driver-side fallback (chunk loads + local aggregation — old behavior) for
 * sessions running without the engine's extensions.
 */
class DistributedMetaTable(tableName: String, tableSchema: StructType,
    val kind: String, val raw: ChunkEntriesTable, val currentVersion: Long)
  extends Table with SupportsRead {

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  /** Fallback only (no-extensions sessions): materialize the raw rows driver-
    * side and aggregate locally — the exact pre-distribution behavior. */
  private lazy val fallbackRows: Seq[Array[Any]] = {
    val raws = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
    raw.newScanBuilder(CaseInsensitiveStringMap.empty()).build().toBatch
      .planInputPartitions().foreach {
        case p: ChunkSlicePartition =>
          ChunkJson.parse(p.chunkPath).foreach(f => raws += ChunkEntryMode.rowOf(raw.mode, f, p))
        case LocalRowsPartition(rows) => rows.foreach(r => raws += r.toArray)
        case other => throw new IllegalStateException(s"unexpected partition $other")
      }
    GraftMetadataScanRule.aggregateLocally(kind, raws.toSeq, currentVersion)
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = tableSchema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        Array(LocalRowsPartition(fallbackRows.map(_.toIndexedSeq).toIndexedSeq))
      override def createReaderFactory(): PartitionReaderFactory =
        new LocalRowsReaderFactory
    }
}
