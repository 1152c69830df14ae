package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.table.TransactionalTable

/**
 * Iceberg-style SQL metadata tables (`table.history`, `table.snapshots`,
 * `table.files`) resolved through the DSv2 catalog:
 *
 *   SELECT * FROM graft.db.retail.history
 *
 * The reference inspects the same metadata through Iceberg's Glue-registered
 * metadata tables / the console (`README.md:507-513` verifies commits by
 * querying the table's state). Rows are computed driver-side from the
 * manifests at resolution time — metadata is O(versions + files) and never
 * touches data, so the scan is a single local partition.
 */
object MetadataTables {

  val Names: Set[String] =
    Set("history", "snapshots", "files", "partitions", "refs", "manifests",
      "delete_files", "all_files", "entries", "lineage")

  private val historySchema = StructType(Seq(
    StructField("version", LongType), StructField("batch_id", LongType),
    // Iceberg snapshot-summary `operation` parity (merge/append/compact/…)
    StructField("operation", StringType),
    StructField("n_files", LongType), StructField("n_rows", LongType),
    StructField("n_bytes", LongType), StructField("committed_at_ms", LongType),
    // Iceberg snapshot-summary parity: per-commit churn vs the previous
    // retained version, derived by manifest diffing at resolution time
    StructField("added_files", LongType), StructField("added_rows", LongType),
    StructField("removed_files", LongType), StructField("removed_rows", LongType),
    StructField("n_delete_files", LongType)))

  private val filesSchema = StructType(Seq(
    StructField("path", StringType), StructField("partition", StringType),
    StructField("pk_min", LongType), StructField("pk_max", LongType),
    StructField("n_rows", LongType), StructField("n_bytes", LongType),
    StructField("kind", StringType),
    // partition evolution: the spec era each file was written under
    StructField("spec_id", LongType)))

  private val entriesSchema = StructType(Seq(
    StructField("status", LongType), StructField("added_version", LongType),
    StructField("path", StringType), StructField("kind", StringType),
    StructField("n_rows", LongType), StructField("n_bytes", LongType)))

  private val allFilesSchema = StructType(Seq(
    StructField("path", StringType), StructField("partition", StringType),
    StructField("pk_min", LongType), StructField("pk_max", LongType),
    StructField("n_rows", LongType), StructField("n_bytes", LongType),
    StructField("spec_id", LongType),
    StructField("first_version", LongType), StructField("last_version", LongType)))

  private val partitionsSchema = StructType(Seq(
    StructField("partition", StringType), StructField("spec_id", LongType),
    StructField("n_files", LongType), StructField("n_rows", LongType),
    StructField("n_bytes", LongType)))

  private val refsSchema = StructType(Seq(
    StructField("name", StringType), StructField("type", StringType),
    StructField("version", LongType)))

  private val manifestsSchema = StructType(Seq(
    StructField("path", StringType), StructField("n_files", LongType),
    StructField("n_rows", LongType), StructField("n_bytes", LongType),
    StructField("pk_min", LongType), StructField("pk_max", LongType),
    StructField("spec_id", LongType),
    // comma-joined distinct partition values; NULL when mixed-spec or the
    // per-chunk list blew ChunkRef.PartitionCap
    StructField("partitions", StringType)))

  /** Retained-history chunk slices for the distributed entries/all_files
    * scans: every DISTINCT chunk across retained snapshots (up to `upTo` —
    * time travel scopes the reach) with the min/max version referencing it —
    * resolved from manifest JSON chunk-ref lists alone (zero chunk loads,
    * O(versions × chunk refs) driver work). Files of legacy inline manifests
    * (already resident in the JSON) come back as local HistSchema rows with
    * driver-computed ranges. */
  private def histSlices(t: TransactionalTable, upTo: Long)
      : (Seq[ChunkSlicePartition], Seq[Array[Any]]) = {
    val snaps = (0L to upTo).flatMap(v =>
      scala.util.Try(t.snapshotAt(v)).toOption)
    // the parent retained snapshot of the scoped head (entries.status means
    // "carried from parent"; exact membership, not a range test — rollback
    // re-adds must grade as added)
    val parentV = snaps.map(_.version).filter(_ < upTo).lastOption
    val chunkRange = scala.collection.mutable.LinkedHashMap
      .empty[String, (Long, Long, Boolean)]
    val chunkStats = scala.collection.mutable.HashMap
      .empty[String, (Long, Long, Option[Seq[String]])]
    val inlineRange = scala.collection.mutable.LinkedHashMap
      .empty[String, (graft.table.DataFile, Long, Long, Boolean)]
    snaps.foreach { s =>
      val isParent = parentV.contains(s.version)
      s.files match {
        case mf: graft.table.ManifestFiles =>
          mf.chunks.foreach { c =>
            chunkStats(c.path) = (c.pkMin, c.pkMax, c.partitions)
            chunkRange.get(c.path) match {
              case None => chunkRange(c.path) = (s.version, s.version, isParent)
              case Some((first, _, inPar)) =>
                chunkRange(c.path) = (first, s.version, inPar || isParent)
            }
          }
        case sq =>
          sq.foreach { f =>
            inlineRange.get(f.path) match {
              case None => inlineRange(f.path) = (f, s.version, s.version, isParent)
              case Some((f0, first, _, inPar)) =>
                inlineRange(f.path) = (f0, first, s.version, inPar || isParent)
            }
          }
      }
    }
    val slices = chunkRange.toSeq.map { case (p, (first, last, inPar)) =>
      val (mn, mx, parts) = chunkStats.getOrElse(p,
        (Long.MinValue, Long.MaxValue, None: Option[Seq[String]]))
      ChunkSlicePartition(p, first, last, inPar, pkMin = mn, pkMax = mx, parts = parts)
    }
    val inlineRows = inlineRange.values.toSeq.map { case (f, first, last, inPar) =>
      Array[Any](f.path, f.partition.orNull, f.pkMin, f.pkMax, f.rows, f.bytes,
        "data", f.specId.toLong, first, last, if (inPar) 1L else 0L)
    }
    (slices, inlineRows)
  }

  /** Build the metadata table `metaName` for the table at `root`.
    * `version` scopes the answer for time travel (`t.files VERSION AS OF n`
    * = the file inventory OF snapshot n; history/all_files restrict their
    * walk to versions ≤ n) — without it a travel read would silently serve
    * the live state. `refs` stays live (named refs are not versioned). */
  def load(t: TransactionalTable, qualified: String, metaName: String,
      version: Option[Long] = None): Table = {
    val head = version.getOrElse(t.currentVersion)
    def headSnap = t.snapshotAt(head)
    metaName match {
      case "history" | "snapshots" =>
        val snaps = (0L to head).flatMap(v =>
          scala.util.Try(t.snapshotAt(v)).toOption) // expired → absent
        // Per-version churn by CHUNK diffing: commits reuse clean chunks by
        // reference, so only the chunks unique to one side load — O(churn)
        // entry loads per version pair, never O(files). (Within one
        // manifest chunks hold disjoint file sets, so a path in a cur-only
        // chunk lives in the parent iff it is in a parent-only chunk.)
        def sideOnly(a: Seq[graft.table.DataFile], b: Seq[graft.table.DataFile])
            : (Seq[graft.table.DataFile], Seq[graft.table.DataFile]) = (a, b) match {
          case (am: graft.table.ManifestFiles, bm: graft.table.ManifestFiles) =>
            val aPaths = am.chunks.map(_.path).toSet
            val bPaths = bm.chunks.map(_.path).toSet
            (am.loadWhere(c => !bPaths.contains(c.path)),
              bm.loadWhere(c => !aPaths.contains(c.path)))
          case _ => (a, b) // inline legacy manifests are already materialized
        }
        def totalBytes(fs: Seq[graft.table.DataFile]): Long = fs match {
          case mf: graft.table.ManifestFiles =>
            mf.totalBytes.getOrElse(mf.iterator.map(_.bytes).sum)
          case s => s.iterator.map(_.bytes).sum
        }
        def totalRows(fs: Seq[graft.table.DataFile]): Long = fs match {
          case mf: graft.table.ManifestFiles =>
            mf.totalRows.getOrElse(mf.iterator.map(_.rows).sum)
          case s => s.iterator.map(_.rows).sum
        }
        val rows = snaps.zipWithIndex.map { case (s, i) =>
          val (addedN, addedRows, removedN, removedRows) =
            if (i == 0)
              // earliest retained snapshot: everything counts as added —
              // answered from chunk stats, zero loads
              (s.files.size.toLong, totalRows(s.files), 0L, 0L)
            else {
              val (pOnly, cOnly) = sideOnly(snaps(i - 1).files, s.files)
              val pPaths = pOnly.map(_.path).toSet
              val cPaths = cOnly.map(_.path).toSet
              val added = cOnly.filterNot(f => pPaths(f.path))
              val removed = pOnly.filterNot(f => cPaths(f.path))
              (added.size.toLong, added.map(_.rows).sum,
                removed.size.toLong, removed.map(_.rows).sum)
            }
          Array[Any](s.version, s.batchId, t.operationOf(s.version).orNull,
            s.files.size.toLong,
            s.rowCount, totalBytes(s.files), s.committedAtMs,
            addedN, addedRows, removedN, removedRows, s.deletes.size.toLong)
        }
        new LocalRowsTable(s"$qualified.$metaName", historySchema, rows)
      // `files` is a DISTRIBUTED chunk scan (one input partition per manifest
      // chunk, entries parsed executor-side): planning ships chunk refs only,
      // so a 10⁷-file table's file inventory streams instead of materializing
      // on the driver. MOR delete inventories and legacy inline manifests are
      // already resident in the manifest JSON — they ride in one local
      // partition at zero extra cost.
      case "files" =>
        val s = headSnap
        val (slices, inlineData) = s.files match {
          case mf: graft.table.ManifestFiles =>
            (mf.chunks.map(c => ChunkSlicePartition(c.path, 0L, 0L,
              pkMin = c.pkMin, pkMax = c.pkMax, parts = c.partitions)),
              Seq.empty[Array[Any]])
          case sq =>
            (Seq.empty[ChunkSlicePartition], sq.map(f =>
              Array[Any](f.path, f.partition.orNull, f.pkMin, f.pkMax, f.rows, f.bytes,
                "data", f.specId.toLong)))
        }
        val delRows = s.deletes.map(d =>
          Array[Any](d.path, null, d.pkMin, d.pkMax, d.rows, d.bytes, s"${d.kind}-deletes",
            null))
        new ChunkEntriesTable(s"$qualified.files", filesSchema, ChunkEntryMode.Files,
          slices, inlineData ++ delRows)
      // Iceberg `partitions` parity: per-(partition value, spec era) file and
      // row totals of the LIVE snapshot — where CoW amplification, MOR skew,
      // and spec-migration progress become visible without touching data.
      // Iceberg `entries` parity (status-annotated manifest entries of the
      // LIVE snapshot): every current data/delete file with the status it
      // carries relative to the parent snapshot (1=added this version,
      // 0=existing carry-over) and the version that first added it.
      // `entries` and `all_files` need a per-path min/max over the retained
      // history; the driver walks manifest JSON chunk-ref lists ONLY (first/
      // last version referencing each chunk) and hands Spark a chunk-
      // partitioned raw scan + groupBy(path) via GraftMetadataScanRule's
      // substitution — no entry is ever materialized driver-side. Legacy
      // inline-manifest snapshots (files resident in the JSON) contribute a
      // local partition with driver-computed ranges.
      case "entries" =>
        val (slices, inlineRows) = histSlices(t, head)
        val cur = headSnap
        val delRows = cur.deletes.map(d =>
          Array[Any](d.path, null, d.pkMin, d.pkMax, d.rows, d.bytes,
            s"${d.kind}-deletes", null, cur.version, cur.version, 0L))
        val raw = new ChunkEntriesTable(s"$qualified.entries_raw",
          ChunkEntryMode.HistSchema, ChunkEntryMode.Hist, slices, inlineRows ++ delRows)
        new DistributedMetaTable(s"$qualified.entries", entriesSchema, "entries",
          raw, head)
      // Iceberg `delete_files` parity: just the MOR delete-file inventory of
      // the live snapshot (eq/pos), the table one watches to decide when to
      // fold (compact) — `files` interleaves these with data files.
      case "delete_files" =>
        val rows = headSnap.deletes.map(d =>
          Array[Any](d.path, null, d.pkMin, d.pkMax, d.rows, d.bytes,
            s"${d.kind}-deletes", null))
        new LocalRowsTable(s"$qualified.delete_files", filesSchema, rows)
      // Iceberg `all_files` parity: every data file reachable from ANY
      // retained snapshot, deduped by path, with the version range it was
      // live in — the orphan-analysis / compaction-planning view.
      case "all_files" =>
        val (slices, inlineRows) = histSlices(t, head)
        val raw = new ChunkEntriesTable(s"$qualified.all_files_raw",
          ChunkEntryMode.HistSchema, ChunkEntryMode.Hist, slices, inlineRows)
        new DistributedMetaTable(s"$qualified.all_files", allFilesSchema, "all_files",
          raw, head)
      // `partitions` also aggregates over every live entry — distributed via
      // the same substitution (groupBy(partition, spec_id) over the chunk
      // scan); data files only, matching the original driver-side grouping.
      case "partitions" =>
        val s = headSnap
        val (slices, inlineData) = s.files match {
          case mf: graft.table.ManifestFiles =>
            (mf.chunks.map(c => ChunkSlicePartition(c.path, 0L, 0L,
              pkMin = c.pkMin, pkMax = c.pkMax, parts = c.partitions)),
              Seq.empty[Array[Any]])
          case sq =>
            (Seq.empty[ChunkSlicePartition], sq.map(f =>
              Array[Any](f.path, f.partition.orNull, f.pkMin, f.pkMax, f.rows, f.bytes,
                "data", f.specId.toLong)))
        }
        val raw = new ChunkEntriesTable(s"$qualified.partitions_raw", filesSchema,
          ChunkEntryMode.Files, slices, inlineData)
        new DistributedMetaTable(s"$qualified.partitions", partitionsSchema, "partitions",
          raw, head)
      // Iceberg `refs` parity: every named ref — main, branches, tags — with
      // the version it points at.
      case "refs" =>
        val rows =
          (Seq(("main", "branch", t.currentVersion)) ++
            t.listBranches.sorted.map(b => (b, "branch", t.branch(b).currentVersion)) ++
            t.tags.toSeq.sortBy(_._1).map { case (n, v) => (n, "tag", v) })
            .map { case (n, k, v) => Array[Any](n, k, v) }
        new LocalRowsTable(s"$qualified.refs", refsSchema, rows)
      // Iceberg `manifests` parity over the engine's chunked manifest layer:
      // one row per chunk with the chunk-level stats planning prunes by
      // (pk range, row/byte totals, partition-value summary) — the
      // manifest-list view, answered WITHOUT loading any chunk's entries.
      case "manifests" =>
        val rows = (headSnap.files match {
          case mf: graft.table.ManifestFiles => mf.chunks
          case s => Seq(graft.table.ChunkRef.of("(inline)", s))
        }).map { c =>
          Array[Any](c.path, c.count.toLong,
            if (c.rows >= 0) c.rows else null,
            if (c.bytes >= 0) c.bytes else null,
            if (c.pkMin != Long.MinValue) c.pkMin else null,
            if (c.pkMax != Long.MaxValue) c.pkMax else null,
            c.specId.map(_.toLong).orNull,
            c.partitions.map(_.mkString(",")).orNull)
        }
        new LocalRowsTable(s"$qualified.manifests", manifestsSchema, rows)
      // Row lineage (Iceberg v3 metadata columns, served as a metadata
      // table): the snapshot's rows plus `_row_id` (stable identity) and
      // `_last_updated_seq`. A placeholder relation — GraftMorScanRule
      // substitutes the engine's lineage-resolving scan during analysis,
      // version-pinned so `VERSION AS OF` composes.
      case "lineage" =>
        require(t.rowLineageEnabled,
          s"$qualified: row lineage is not enabled (ALTER TABLE ... SET " +
            "TBLPROPERTIES('row.lineage'='true'))")
        val sch = t.schemaAt(head)
          .add("_row_id", LongType).add("_last_updated_seq", LongType)
        new LineageMetaTable(s"$qualified.lineage", sch, t.root, head)
      case other =>
        throw new IllegalArgumentException(s"unknown metadata table $other")
    }
  }
}

/** Placeholder relation for `db.t.lineage`: carries the table root and the
  * pinned version; [[GraftMorScanRule]] substitutes the engine's
  * lineage-resolving scan during analysis (data-scale — it must never
  * execute as a driver-side rows table). */
private[sql] class LineageMetaTable(tableName: String, tableSchema: StructType,
    val root: String, val pinnedVersion: Long) extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    throw new IllegalStateException(
      s"$tableName must be substituted by GraftMorScanRule — are the " +
        "graft.sql.GraftExtensions installed on this session?")
}

/** Read-only DSv2 table over driver-computed rows (metadata-scale only):
  * one local input partition, values pre-converted to Catalyst form. */
private[sql] class LocalRowsTable(tableName: String, tableSchema: StructType,
    rows: Seq[Array[Any]]) extends Table with SupportsRead {

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = tableSchema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        Array(LocalRowsPartition(rows.map(_.toIndexedSeq).toIndexedSeq))
      override def createReaderFactory(): PartitionReaderFactory =
        new LocalRowsReaderFactory
    }
}

private[sql] final case class LocalRowsPartition(rows: IndexedSeq[IndexedSeq[Any]])
  extends InputPartition

private[sql] class LocalRowsReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[LocalRowsPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow =
        new GenericInternalRow(rows(i).map {
          case s: String => UTF8String.fromString(s)
          case v => v.asInstanceOf[AnyRef]
        }.toArray[Any])
      override def close(): Unit = ()
    }
  }
}
