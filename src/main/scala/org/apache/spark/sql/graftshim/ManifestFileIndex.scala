package org.apache.spark.sql.graftshim

import scala.collection.mutable.LinkedHashMap

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal, Or}
import org.apache.spark.sql.classic
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.{FileStatusCache, PartitionDirectory, PartitioningAwareFileIndex, PartitionSpec}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Manifest entry mirror (path + partition value + PK min/max + size +
  * per-column [min,max] stats (lower-cased names) + optional PK bloom) —
  * kept dependency-free of graft.table to avoid a package cycle
  * (graft.util.Bloom is a shared leaf). */
final case class ManifestEntry(path: String, partition: Option[String], pkMin: Long,
    pkMax: Long, bytes: Long, stats: Map[String, (Long, Long)] = Map.empty,
    bloom: Option[String] = None,
    /** The transform THIS file's partition value was derived under (partition
      * evolution: files of different eras carry different transforms; pruning
      * reverses each file's own). None → no partition pruning for the file. */
    part: Option[PartitionTransformDesc] = None,
    /** Exact row count (manifest stat); -1 when unknown (synthetic entries).
      * Feeds the partition-filtered COUNT(*) metadata fold. */
    rows: Long = -1L) {
  /** Decoded lazily ONCE per entry — point-lookup queries probe it per file. */
  lazy val bloomBits: Option[Array[Long]] = bloom.map(graft.util.Bloom.decode)
}

/** One manifest chunk as the SQL layer sees it: chunk-level aggregate stats
  * (enough to prune the WHOLE chunk against pushed filters) plus a deferred
  * entry loader. Sentinel ranges (`Long.MinValue..MaxValue`, `bytes = -1`)
  * mark stat-less legacy chunks — they overlap everything and always load. */
final case class EntryChunk(
    count: Int,
    pkMin: Long,
    pkMax: Long,
    bytes: Long,
    /** Distinct partition values of the chunk's files (uniform spec only). */
    partitions: Option[Seq[String]],
    /** The transform those partition values were derived under. */
    part: Option[PartitionTransformDesc],
    /** Chunk-merged column [min,max] (intersection of per-file stats). */
    stats: Map[String, (Long, Long)],
    load: () => Seq[ManifestEntry],
    /** Exact chunk row total (manifest stat); -1 = stat-less legacy chunk
      * (the filtered-count fold loads such chunks and sums per-entry). */
    rows: Long = -1L)

object EntryChunk {
  /** Wrap already-materialized entries (streaming micro-batches, legacy
    * manifests): stats merge from the in-memory entries, load is free. */
  def eager(entries: Seq[ManifestEntry]): EntryChunk = {
    val statKeys =
      if (entries.isEmpty) Set.empty[String]
      else entries.iterator.map(_.stats.keySet).reduce(_ intersect _)
    val merged = statKeys.iterator.map { k =>
      k -> ((entries.iterator.map(_.stats(k)._1).min,
        entries.iterator.map(_.stats(k)._2).max))
    }.toMap
    EntryChunk(entries.length,
      if (entries.isEmpty) Long.MinValue else entries.iterator.map(_.pkMin).min,
      if (entries.isEmpty) Long.MaxValue else entries.iterator.map(_.pkMax).max,
      entries.iterator.map(_.bytes).sum, None, None, merged, () => entries,
      rows = if (entries.forall(_.rows >= 0)) entries.iterator.map(_.rows).sum else -1L)
  }
}

/** A lazily-chunked `Seq[ManifestEntry]`: metadata answers (length, isEmpty)
  * come from chunk counts; full traversal loads every chunk. Carried by
  * GraftSqlTable so planning (ManifestFileIndex) can reach the chunk
  * structure while entry-shaped consumers (metadata-only COUNT/MIN/MAX
  * folds) keep working unchanged. */
final class LazyManifest(val chunkList: Seq[EntryChunk])
    extends scala.collection.immutable.Seq[ManifestEntry] {
  private lazy val all: IndexedSeq[ManifestEntry] = {
    import scala.collection.parallel.CollectionConverters._
    if (chunkList.lengthCompare(2) < 0) chunkList.flatMap(_.load()).toIndexedSeq
    else chunkList.par.map(_.load()).seq.flatten.toIndexedSeq
  }
  override def length: Int = chunkList.iterator.map(_.count).sum
  override def isEmpty: Boolean = !chunkList.exists(_.count > 0)
  override def apply(i: Int): ManifestEntry = all(i)
  override def iterator: Iterator[ManifestEntry] = all.iterator
}

/**
 * A FileIndex fed from the TransactionalTable MANIFEST instead of a directory
 * listing: `listFiles` prunes by per-file partition value and PK min/max
 * stats against the pushed data filters — so a SQL query like
 * `WHERE event = 'cart' AND trans_id = 21` through the graft catalog never
 * opens files (or even footers) that cannot match. This is the SQL-path twin
 * of the engine API's merge-time file skipping, and what Iceberg's manifests
 * provide Athena in the reference. Conservative: a file is skipped only when
 * a conjunct PROVES it cannot contain a matching row.
 *
 * Pruning is TWO-LEVEL (Iceberg's manifest-list → manifest layering): pushed
 * and runtime filters first rule out whole CHUNKS by chunk-level stats —
 * without loading a single entry — then rule out files of the surviving
 * chunks entry by entry. A point lookup against a 10⁷-file table touches
 * O(matching chunks) of driver memory, not the whole manifest.
 */
class ManifestFileIndex(
    spark: SparkSession,
    val chunks: Seq[EntryChunk],
    pk: String,
    /** True when the table's PK is a string: manifest pkMin/pkMax/bloom live
      * in the xxhash64 key domain (seed 42, matching the write side), so
      * EQUALITY literals prune via their hash and range predicates on the PK
      * never prune (a hash domain has no order). */
    pkHashed: Boolean = false)
  extends PartitioningAwareFileIndex(
    spark.asInstanceOf[classic.SparkSession], Map.empty, None,
    FileStatusCache.getOrCreate(spark.asInstanceOf[classic.SparkSession])) {

  // Statuses come from manifest metadata alone — listing/planning a scan
  // touches NO data file (the same property Iceberg manifests give planners).
  private def statusOf(e: ManifestEntry): FileStatus =
    new FileStatus(e.bytes, false, 1, 128L * 1024 * 1024, 0L, new Path(e.path))

  /** Full materialization — metadata surfaces that genuinely need every
    * entry (leafFiles, inputFiles). Planning (listFiles) does NOT use it. */
  private lazy val allEntries: Seq[ManifestEntry] = {
    import scala.collection.parallel.CollectionConverters._
    if (chunks.lengthCompare(2) < 0) chunks.flatMap(_.load())
    else chunks.par.map(_.load()).seq.flatten
  }

  override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec
  override def leafFiles: LinkedHashMap[Path, FileStatus] =
    LinkedHashMap(allEntries.map(e => new Path(e.path) -> statusOf(e)): _*)
  override def leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    allEntries.map(statusOf).groupBy(_.getPath.getParent)
      .view.mapValues(_.toArray).toMap
  override def rootPaths: Seq[Path] = allEntries.map(e => new Path(e.path))
  override def refresh(): Unit = ()
  override def sizeInBytes: Long =
    if (chunks.forall(_.bytes >= 0)) chunks.iterator.map(_.bytes).sum
    else allEntries.map(_.bytes).sum
  override def inputFiles: Array[String] = allEntries.map(_.path).toArray

  /** Runtime (join-time) filters installed by [[GraftScan.filter]] —
    * DSv2 runtime filtering: a broadcast join's build-side key set arrives as
    * an IN predicate after planning, and whole files provably outside it are
    * dropped before the batch re-plans. Identity functions until then; the
    * chunk-level twin prunes whole chunks before their entries load. */
  @volatile private var runtimeKeep: ManifestEntry => Boolean = _ => true
  @volatile private var runtimeKeepChunk: EntryChunk => Boolean = _ => true

  /** The chunk reduced to synthetic per-partition entries carrying its
    * chunk-wide stats: a chunk provably holds no match only if EVERY such
    * entry is unmatchable (a chunk is a union of hypothetical files, one per
    * partition value, each spanning the chunk's pk/stat ranges). No bloom,
    * no per-file tightness — strictly more conservative than entry pruning. */
  private def chunkEntries(c: EntryChunk): Seq[ManifestEntry] = {
    val base = ManifestEntry("", None, c.pkMin, c.pkMax,
      math.max(c.bytes, 0L), c.stats, None, None)
    c.partitions match {
      case Some(ps) if c.part.isDefined && ps.nonEmpty =>
        ps.map(p => base.copy(partition = Some(p), part = c.part))
      case _ => Seq(base)
    }
  }

  private def chunkNoMatch(c: EntryChunk, f: Expression): Boolean =
    chunkEntries(c).forall(e => provablyNoMatch(e, f))

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept = chunks.iterator
      .filter(c => runtimeKeepChunk(c) &&
        !dataFilters.exists(f => chunkNoMatch(c, f)))
      .flatMap(_.load())
      .filter(e => runtimeKeep(e) && !dataFilters.exists(f => provablyNoMatch(e, f)))
      .map(statusOf).toArray
    Seq(PartitionDirectory(InternalRow.empty, kept))
  }

  /** Columns a runtime filter can prune files by: the PK (manifest ranges +
    * blooms), any column with chunk-level [min,max] stats, and the partition
    * source columns (transform-reversing prune) — all answerable from chunk
    * metadata without loading entries. */
  def prunableColumns: Seq[String] =
    (Seq(pk) ++ chunks.flatMap(_.stats.keys) ++ chunks.flatMap(_.part.map(_.col))).distinct

  /** Table-wide [min,max] per column, merged from chunk-level stats —
    * O(chunks) metadata, zero entry loads. Only columns EVERY chunk tracks
    * qualify (a chunk without the stat would make the range partial); the
    * PK rides its dedicated pkMin/pkMax range unless hash-domain (string
    * PKs have no value order in the manifest). Feeds the scan's reported
    * column statistics (CBO range selectivity). */
  def columnRanges: Map[String, (Long, Long)] = {
    val fromStats =
      if (chunks.isEmpty) Map.empty[String, (Long, Long)]
      else {
        val common = chunks.iterator.map(_.stats.keySet).reduce(_ intersect _)
        common.iterator.map { k =>
          k -> ((chunks.iterator.map(_.stats(k)._1).min,
            chunks.iterator.map(_.stats(k)._2).max))
        }.toMap
      }
    val pkRange =
      if (!pkHashed && chunks.nonEmpty &&
          chunks.forall(c => c.pkMin != Long.MinValue && c.pkMax != Long.MaxValue))
        Map(pk.toLowerCase(java.util.Locale.ROOT) ->
          ((chunks.iterator.map(_.pkMin).min, chunks.iterator.map(_.pkMax).max)))
      else Map.empty[String, (Long, Long)]
    pkRange ++ fromStats
  }

  /** Install a runtime filter from DSv2 join predicates (IN / = on a
    * prunable column). Returns true when a usable predicate was found. A
    * file survives if ANY value could match — exactly [[noEq]]'s negation,
    * so runtime pruning and static pruning can never disagree; a chunk
    * survives if ANY of its synthetic per-partition entries could match. */
  def applyRuntimeFilter(
      preds: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Boolean = {
    import org.apache.spark.sql.connector.expressions.{LiteralValue, NamedReference}
    val keeps = preds.toSeq.flatMap { p =>
      (p.name, p.children.toSeq) match {
        case ("IN", (f: NamedReference) +: vs) if vs.nonEmpty &&
            vs.forall(_.isInstanceOf[LiteralValue[_]]) =>
          val colName = f.fieldNames.mkString(".")
          val lits = vs.map(_.asInstanceOf[LiteralValue[_]])
          Some((e: ManifestEntry) => lits.exists(l => !noEq(e, colName, l.value, l.dataType)))
        case ("=", Seq(f: NamedReference, l: LiteralValue[_])) =>
          Some((e: ManifestEntry) => !noEq(e, f.fieldNames.mkString("."), l.value, l.dataType))
        case _ => None
      }
    }
    if (keeps.nonEmpty) {
      runtimeKeep = e => keeps.forall(k => k(e))
      runtimeKeepChunk = c => chunkEntries(c).exists(e => keeps.forall(k => k(e)))
    }
    keeps.nonEmpty
  }

  /** True only when `f` can contain NO row satisfying `expr`. */
  private def provablyNoMatch(e: ManifestEntry, expr: Expression): Boolean = expr match {
    case And(l, r) => provablyNoMatch(e, l) || provablyNoMatch(e, r)
    case Or(l, r) => provablyNoMatch(e, l) && provablyNoMatch(e, r)

    case EqualTo(a: Attribute, Literal(v, dt)) => noEq(e, a.name, v, dt)
    case EqualTo(Literal(v, dt), a: Attribute) => noEq(e, a.name, v, dt)
    case In(a: Attribute, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.forall { l0 => val l = l0.asInstanceOf[Literal]; noEq(e, a.name, l.value, l.dataType) }

    // Range pruning on ANY column with manifest [min,max] stats — the PK
    // always has them; other integral/timestamp columns carry theirs in
    // `stats` (Iceberg column-stats parity). Temporal hidden partitioning
    // (days/hours) adds a second prune dimension: a range predicate on the
    // partition SOURCE column rules out files whose partition ordinal lies
    // wholly outside the literal's (the file's partition value IS its
    // day/hour, so the comparison is exact at that granularity).
    case GreaterThan(a: Attribute, Literal(v, dt)) =>
      check(e, a.name, v)((mn, mx, l) => mx <= l) ||
        partRange(e, a.name, v, dt)((p, l) => p < l)
    case GreaterThanOrEqual(a: Attribute, Literal(v, dt)) =>
      check(e, a.name, v)((mn, mx, l) => mx < l) ||
        partRange(e, a.name, v, dt)((p, l) => p < l)
    case LessThan(a: Attribute, Literal(v, dt)) =>
      check(e, a.name, v)((mn, mx, l) => mn >= l) ||
        partRange(e, a.name, v, dt)((p, l) => p > l)
    case LessThanOrEqual(a: Attribute, Literal(v, dt)) =>
      check(e, a.name, v)((mn, mx, l) => mn > l) ||
        partRange(e, a.name, v, dt)((p, l) => p > l)
    case GreaterThan(Literal(v, dt), a: Attribute) =>
      check(e, a.name, v)((mn, mx, l) => mn >= l) ||
        partRange(e, a.name, v, dt)((p, l) => p > l)
    case GreaterThanOrEqual(Literal(v, dt), a: Attribute) =>
      check(e, a.name, v)((mn, mx, l) => mn > l) ||
        partRange(e, a.name, v, dt)((p, l) => p > l)
    case LessThan(Literal(v, dt), a: Attribute) =>
      check(e, a.name, v)((mn, mx, l) => mx <= l) ||
        partRange(e, a.name, v, dt)((p, l) => p < l)
    case LessThanOrEqual(Literal(v, dt), a: Attribute) =>
      check(e, a.name, v)((mn, mx, l) => mx < l) ||
        partRange(e, a.name, v, dt)((p, l) => p < l)

    case _ => false
  }

  private def isPk(name: String): Boolean = name.equalsIgnoreCase(pk)
  /** The file's OWN transform, when the predicate column is its source —
    * partition evolution means this is per-entry, never table-level. */
  private def partOf(e: ManifestEntry, name: String): Option[PartitionTransformDesc] =
    e.part.filter(_.col.equalsIgnoreCase(name))

  /** Temporal-partition range pruning: true when the file's partition
    * ordinal provably fails `impossible(partOrdinal, literalOrdinal)`.
    * Unordered transforms (bucket) and unparseable values never prune. */
  private def partRange(e: ManifestEntry, name: String, v: Any,
      dt: org.apache.spark.sql.types.DataType)(
      impossible: (Long, Long) => Boolean): Boolean =
    partOf(e, name).exists { d =>
      v != null && (for {
        l <- PartitionPrune.ordinalOf(d, v, dt)
        p <- e.partition.flatMap(PartitionPrune.partitionOrdinal(d, _))
      } yield impossible(p, l)).getOrElse(false)
    }

  /** [min,max] for `name` when the manifest tracks it (PK always; others via
    * per-file stats). */
  private def rangeOf(e: ManifestEntry, name: String): Option[(Long, Long)] =
    if (isPk(name)) Some((e.pkMin, e.pkMax))
    else e.stats.get(name.toLowerCase(java.util.Locale.ROOT))

  /** Applies `impossible(min, max, literal)` when both a tracked range and a
    * numeric literal exist; anything else → not provably unmatchable. A
    * hashed PK's range is ORDERLESS — never range-prune on it. */
  private def check(e: ManifestEntry, name: String, v: Any)(
      impossible: (Long, Long, Long) => Boolean): Boolean =
    if (pkHashed && isPk(name)) false
    else (rangeOf(e, name), toLongOpt(v)) match {
      case (Some((mn, mx)), Some(l)) => impossible(mn, mx, l)
      case _ => false
    }

  private def toLongOpt(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case _ => None
  }

  private def noEq(e: ManifestEntry, colName: String, v: Any,
      dt: org.apache.spark.sql.types.DataType): Boolean =
    if (v == null) false
    else if (partOf(e, colName).isDefined)
      // Transform-aware: derive the partition value the literal's rows MUST
      // live in (identity → itself; days/hours → epoch ordinal; bucket →
      // xxhash64 mod n) under the FILE's own spec and prune files in any
      // other partition. An underivable literal yields None → no prune. A
      // stats-based prune on the same column may still apply below, so fall
      // through on false.
      partOf(e, colName).flatMap(d => PartitionPrune.valueOf(d, v, dt))
        .exists(expected => e.partition.exists(_ != expected)) ||
        ((rangeOf(e, colName), toLongOpt(v)) match {
          case (Some((mn, mx)), Some(l)) => l < mn || l > mx
          case _ => false
        })
    else (rangeOf(e, colName), keyOf(colName, v, dt)) match {
      case (Some((mn, mx)), Some(l)) =>
        l < mn || l > mx ||
          // PK point lookup: the bloom can rule the file out even when its
          // [min,max] span covers the key (the post-churn common case) —
          // the same bitset merge-time pruning uses, now on the SQL path.
          (isPk(colName) && e.bloomBits.exists(!graft.util.Bloom.contains(_, l)))
      case _ => false
    }

  /** Equality-literal key in the column's manifest domain: the numeric value
    * itself, or — for a hashed string PK — the literal's xxhash64 (exactly
    * the hash the write side stamped into pkMin/pkMax and the bloom, so an
    * equality prune is sound; conservative under collisions). */
  private def keyOf(colName: String, v: Any, dt: org.apache.spark.sql.types.DataType)
      : Option[Long] =
    toLongOpt(v).orElse {
      if (pkHashed && isPk(colName)) v match {
        case u: UTF8String =>
          Some(org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(u, dt, 42L))
        case _ => None
      } else None
    }

  private def strOf(v: Any): String = v match {
    case u: UTF8String => u.toString
    case other => other.toString
  }
}

object ManifestFileIndex {
  /** Entry-shaped input to chunk structure: a [[LazyManifest]] exposes its
    * real chunks (two-level pruning); anything else becomes one eager chunk
    * with merged stats (small in-memory lists — streaming batches). */
  def chunksOf(entries: Seq[ManifestEntry]): Seq[EntryChunk] = entries match {
    case lm: LazyManifest => lm.chunkList
    case s => Seq(EntryChunk.eager(s))
  }

  /** Build a ParquetScanBuilder whose file listing is manifest-pruned. */
  def scanBuilder(spark: SparkSession, schema: StructType, entries: Seq[ManifestEntry],
      pk: String, options: CaseInsensitiveStringMap, pkHashed: Boolean = false): ScanBuilder =
    ParquetScanBuilder(spark.asInstanceOf[classic.SparkSession],
      new ManifestFileIndex(spark, chunksOf(entries), pk, pkHashed), schema, schema, options)
}
