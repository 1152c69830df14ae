package graft.table

/**
 * Chunk-level aggregate stats, stored in the manifest's chunk references so
 * planning can prune WHOLE chunks before loading a single entry — Iceberg's
 * manifest-list/manifest layering: the manifest list carries per-manifest
 * partition and key ranges, and a planner reads only manifests whose range
 * can intersect the query. At 10⁵–10⁷ files (100 TB), loading every entry to
 * answer a point lookup or plan a merge is the driver bottleneck; with chunk
 * stats a pruned plan touches O(matching chunks).
 *
 * Sentinel values (`pkMin=Long.MinValue`, `pkMax=Long.MaxValue`, `rows = -1`)
 * mark pre-upgrade chunk refs with no stats: such chunks overlap every
 * range, so they are always loaded — correctness never depends on stats
 * being present.
 */
final case class ChunkRef(
    path: String,
    count: Int,
    pkMin: Long = Long.MinValue,
    pkMax: Long = Long.MaxValue,
    rows: Long = -1L,
    bytes: Long = -1L,
    /** Distinct partition values of the chunk's files — present only when
      * every file carries a partition value, they share one spec id, and
      * there are at most [[ChunkRef.PartitionCap]] distinct values. */
    partitions: Option[Seq[String]] = None,
    /** The uniform partition-spec id behind `partitions` (partition
      * evolution: values are only comparable under one transform). */
    specId: Option[Int] = None,
    /** Chunk-merged column [min,max] — intersection of the columns every
      * file tracks, each spanning the whole chunk. */
    stats: Map[String, (Long, Long)] = Map.empty,
    /** Smallest per-file row count in the chunk (−1 = pre-upgrade ref, not
      * recorded). Lets maintenance detect a MIXED chunk — one huge file
      * hiding many tiny ones behind an above-target mean — without loading
      * a single entry. */
    minFileRows: Long = -1L)

object ChunkRef {
  /** Above this many distinct partition values the per-chunk list stops
    * paying for itself (a chunk spanning many partitions rarely prunes). */
  val PartitionCap = 16

  def of(path: String, files: Seq[DataFile]): ChunkRef = {
    if (files.isEmpty) return ChunkRef(path, 0, rows = 0L, bytes = 0L)
    val statKeys = files.iterator.map(_.stats.keySet).reduce(_ intersect _)
    val merged = statKeys.iterator.map { k =>
      k -> ((files.iterator.map(_.stats(k)._1).min, files.iterator.map(_.stats(k)._2).max))
    }.toMap
    val specIds = files.iterator.map(_.specId).toSeq.distinct
    // The uniform spec id is recorded INDEPENDENTLY of the value list: SPJ
    // eligibility needs only "every file in this chunk was written under
    // spec S" — a 256-bucket table must not lose exchange-free joins just
    // because its per-chunk value list blew the cap below.
    val uniformSpec =
      if (specIds.length == 1 && files.forall(_.partition.isDefined))
        Some(specIds.head)
      else None
    val parts = uniformSpec.flatMap { _ =>
      val vs = files.iterator.flatMap(_.partition).toSeq.distinct
      if (vs.length <= PartitionCap) Some(vs) else None
    }
    ChunkRef(path, files.length,
      files.iterator.map(_.pkMin).min, files.iterator.map(_.pkMax).max,
      files.iterator.map(_.rows).sum, files.iterator.map(_.bytes).sum,
      parts, uniformSpec, merged, files.iterator.map(_.rows).min)
  }
}

/**
 * The file list of a chunked manifest, materialized LAZILY: any whole-list
 * traversal (scans, compaction, commit carry-over) loads all chunks in
 * parallel exactly as before, but metadata answers (`length`, `totalRows`)
 * come from chunk stats alone, and [[loadWhere]] gives planners a
 * chunk-pruned load path that never touches non-matching chunks.
 */
final class ManifestFiles(val chunks: Seq[ChunkRef], loader: String => Seq[DataFile])
    extends scala.collection.immutable.Seq[DataFile] {

  private lazy val all: IndexedSeq[DataFile] = {
    import scala.collection.parallel.CollectionConverters._
    if (chunks.lengthCompare(2) < 0) chunks.flatMap(c => loader(c.path)).toIndexedSeq
    else chunks.par.map(c => loader(c.path)).seq.flatten.toIndexedSeq
  }

  override def length: Int = chunks.iterator.map(_.count).sum
  override def isEmpty: Boolean = !chunks.exists(_.count > 0)
  override def apply(i: Int): DataFile = all(i)
  override def iterator: Iterator[DataFile] = all.iterator

  /** True when every chunk ref carries stats (post-upgrade manifest). */
  def statsComplete: Boolean = chunks.forall(c => c.rows >= 0 && c.bytes >= 0)
  def totalRows: Option[Long] =
    if (statsComplete) Some(chunks.iterator.map(_.rows).sum) else None
  def totalBytes: Option[Long] =
    if (statsComplete) Some(chunks.iterator.map(_.bytes).sum) else None

  /** Entries of the chunks passing `keep` — stat-less chunks have sentinel
    * ranges that overlap everything, so any range-shaped `keep` retains
    * them and pruning stays conservative. */
  def loadWhere(keep: ChunkRef => Boolean): Seq[DataFile] =
    chunks.filter(keep).flatMap(c => loader(c.path))

  /** Entries of one chunk (lazy per-chunk access for the SQL layer). */
  def load(c: ChunkRef): Seq[DataFile] = loader(c.path)

  /** The file list minus `removed`, WITHOUT materializing clean chunks:
    * chunks passing `mayContain` (a conservative pk-overlap test) load and
    * filter exactly; the rest ride along lazily. The commit path uses this
    * so a merge's carried-file list costs O(dirty chunks) loads, not a full
    * manifest materialization. */
  def withoutLazy(removed: Set[String], mayContain: ChunkRef => Boolean): Seq[DataFile] = {
    val (dirty, clean) = chunks.partition(mayContain)
    new AppendedFiles(new ManifestFiles(clean, loader),
      dirty.flatMap(c => loader(c.path)).filterNot(f => removed.contains(f.path)))
  }
}

/** Lazy two-part file list (`base ++ extra` without forcing `base`): commit
  * paths build their post-mutation Snapshot with this so constructing the
  * snapshot never loads manifest chunks — `length` and emptiness answer from
  * part metadata; only a full traversal materializes. */
final class AppendedFiles(base: Seq[DataFile], extra: Seq[DataFile])
    extends scala.collection.immutable.Seq[DataFile] {
  override def length: Int = base.length + extra.length
  override def isEmpty: Boolean = base.isEmpty && extra.isEmpty
  override def apply(i: Int): DataFile =
    if (i < base.length) base(i) else extra(i - base.length)
  override def iterator: Iterator[DataFile] = base.iterator ++ extra.iterator
}
