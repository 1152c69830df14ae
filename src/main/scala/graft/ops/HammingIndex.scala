package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.table.TransactionalTable

/**
 * Persistent Hamming-banded near-duplicate index — the GENERIC core behind
 * [[ImageDedupIndex]] (56-bit perceptual dHash, 4×14 banding) and
 * [[AudioDedupIndex]] (32-bit energy-delta fingerprint, 4×8 banding): any
 * fixed-width perceptual hash gets the same replay-fenced incremental
 * lifecycle over an engine table. Pigeonhole soundness is the caller's
 * banding contract: with `bands` bands, any pair within Hamming distance
 * ≤ `bands − 1` agrees on at least one band, so banded candidates are
 * EXACT for `maxDist ≤ bands − 1` (both instantiations use 4 bands,
 * maxDist 3).
 *
 * Per batch: (1) corpus filter — banded candidate join against the index
 * REFINED by exact Hamming distance (the stored hash travels with every
 * band row, so a random band collision between genuinely different media
 * never drops a keeper); (2) in-batch rule — a smaller media_id within
 * `maxDist` in a shared bucket wins; (3) survivors' band signatures land
 * in ONE replay-fenced commit. The RETURNED kept set is read back from the
 * index's committed rows for this `batchId` (the `batch` column), not from
 * the freshly computed candidate set: on a re-delivered batch the fenced
 * commit no-ops and the read-back returns the ORIGINAL kept set bit-for-bit
 * — even on transitive in-batch chains (A<B<C, A~B, B~C, A≁C) where a
 * recomputation against the now-indexed survivors would orphan C and keep
 * it, diverging the downstream corpus merge from the index (ADVICE r14).
 * Rows the hasher cannot fingerprint are kept, bandless — recomputed
 * deterministically from the batch input on replay. Cost per batch:
 * O(batch bands ⋈ index) on the spread (band, chunk) key — never
 * O(corpus²); `compactEvery` bounds index file count so per-batch join
 * cost stays flat in batch count.
 */
object HammingIndex {

  /** Index row: one per (kept medium, band). `sig_id` (md5-60 of
    * "media:band") is the synthetic primary key — buckets repeat. `batch`
    * stamps the fenced commit that kept the medium, making the committed
    * kept set recoverable per batch (replay read-back). */
  val Schema: StructType = StructType(Seq(
    StructField("sig_id", LongType), StructField("band", LongType),
    StructField("chunk", LongType), StructField("media_id", LongType),
    StructField("hash", LongType), StructField("batch", LongType)))

  def create(spark: SparkSession, root: String): TransactionalTable =
    TransactionalTable.create(spark, root, Schema, pk = "sig_id", partitionCol = None)

  /** Open an existing index, failing FAST on a pre-`batch`-column table —
    * same legacy-schema contract as [[DedupIndex.open]] (ADVICE r15); the
    * read-back serves the MOST RECENT batch per medium (a re-kept medium's
    * rows carry the later batch stamp). */
  def open(spark: SparkSession, root: String): TransactionalTable =
    DedupIndex.requireBatchColumn(TransactionalTable.open(spark, root), root)

  /** DELETE maintenance for the Hamming family (r18 review missing #2):
    * remove `ids`' band rows — a media takedown stops suppressing future
    * legitimate near-matches of the removed content. Same fenced
    * map-only-keys contract as [[DedupIndex.deleteBatch]] (the sig rule is
    * identical); both instantiations ([[ImageDedupIndex]],
    * [[AudioDedupIndex]]) use 4 bands. */
  def deleteBatch(index: TransactionalTable, ids: DataFrame, batchId: Long,
      bands: Int = 4, idCol: String = "media_id"): Unit =
    graft.util.BatchStats.timed("hamming_index_delete") {
      DedupIndex.deleteBandRows(index, ids, idCol, nBands = bands,
        batchId = batchId)
    }

  /**
   * Filter one batch against the index + self-dedup, append the survivors'
   * band signatures as batch `batchId` (replay-fenced), and return the
   * kept media ids. `hashes` = (media_id, hash) for the rows the hasher
   * could fingerprint; `allIds` = every batch row's media_id (rows absent
   * from `hashes` are kept bandless). Safe to call from `foreachBatch`.
   */
  def appendBatch(index: TransactionalTable, hashes: DataFrame,
      allIds: DataFrame, bands: Int, bitsPerBand: Int, batchId: Long,
      maxDist: Int = 3, compactEvery: Int = 0): DataFrame = {
    require(maxDist <= bands - 1,
      s"banded candidates are exact only for maxDist <= bands-1 " +
        s"($maxDist > ${bands - 1})")
    val spark = hashes.sparkSession
    val mask = (1L << bitsPerBand) - 1
    // Hash once — the decode behind `hashes` is the expensive leg; the
    // corpus filter, the self-join, and the append all reuse these bands.
    val banded = hashes.select(col("media_id").cast("long").as("media_id"),
        col("hash"),
        explode(expr(s"transform(sequence(0, ${bands - 1}), c -> " +
          s"named_struct('band', c, 'chunk', (hash >> (c * $bitsPerBand)) & $mask))"))
          .as("x"))
      .select(col("media_id"), col("hash"), col("x.band").cast("long").as("band"),
        col("x.chunk").as("chunk"))
      .persist()
    // (1) corpus filter: the index side is the big one — plain shuffle join
    // on the spread (band, chunk) key. Self-matches excluded so a REPLAYED
    // batch recomputes the identical kept set (the fence no-ops the append).
    val idx = index.scan().select(col("band"), col("chunk"),
      col("media_id").as("_idx_media"), col("hash").as("_idx_hash"))
    val corpusDup = banded.join(idx,
        banded("band") === idx("band") && banded("chunk") === idx("chunk") &&
          banded("media_id") =!= col("_idx_media") &&
          expr("bit_count(hash ^ _idx_hash)") <= maxDist, "left_semi")
      .select("media_id").distinct()
    val cand = banded.join(corpusDup, Seq("media_id"), "left_anti").persist()
    try {
      // (2) in-batch: smaller media_id within maxDist of a shared bucket wins
      val inBatchDup = cand.as("a").join(cand.as("b"),
          col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
            col("b.media_id") < col("a.media_id") &&
            expr("bit_count(a.hash ^ b.hash)") <= maxDist, "left_semi")
        .select(col("media_id")).distinct()
      // unfingerprintable payloads have no hash — kept, bandless (pure
      // function of the batch input: a replay recomputes these identically)
      val hashless = allIds.select(col("media_id").cast("long").as("media_id"))
        .join(banded.select("media_id").distinct(), Seq("media_id"), "left_anti")
      val keptIds = cand.select("media_id").distinct()
        .join(inBatchDup, Seq("media_id"), "left_anti")
      // (3) one fenced commit of the survivors' band signatures, stamped
      // with this batch id — materialized once so the merge's two passes
      // (key-pruning collect + data-file write) don't re-run the banded
      // joins (r19, the DedupIndex.appendBatch fix)
      val rows = graft.util.JobLabel.labeled(spark, "hamming-index:kept-bands") {
        cand.join(keptIds, Seq("media_id"), "left_semi")
          .select(
            TextOps.md5Hash60(concat_ws(":", col("media_id"), col("band"))).as("sig_id"),
            col("band"), col("chunk"), col("media_id"), col("hash"),
            lit(batchId).as("batch"))
          .localCheckpoint(true)
      }
      import spark.implicits._
      index.merge(rows, spark.emptyDataset[Long].toDF("sig_id"), batchId)
      if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
        index.compact()
      // The returned kept set is READ BACK from the committed index rows of
      // this batch: on a replay the fenced merge no-ops and this scan
      // returns the ORIGINAL kept set bit-for-bit, so downstream consumers
      // (the media/corpus pipelines' payload merges) can never diverge from
      // the index even across a crash between the two commits — including
      // on transitive in-batch chains (A<B<C, A~B, B~C, A≁C), where a
      // RECOMPUTATION against the now-indexed survivors would corpus-filter
      // B via A and then keep chain-orphaned C (ADVICE r14). Materialized +
      // lineage-truncated: the result must not re-scan after later batches
      // advance the index.
      graft.util.JobLabel.labeled(spark, "hamming-index:read-back") {
        // stats-pruned to the files whose batch-range can hold this batch —
        // O(files of the batch), not O(index) (r19)
        index.scanWhereEq("batch", batchId).where(col("batch") === batchId)
          .select("media_id").distinct()
          .unionByName(hashless)
          .localCheckpoint(true)
      }.orderBy("media_id")
    } finally {
      cand.unpersist(blocking = false)
      banded.unpersist(blocking = false)
    }
  }
}

/** Persistent AUDIO near-dup index: the [[HammingIndex]] core over
  * [[WavCodec.fingerprint]]'s gain-invariant 32-bit energy-delta hash with
  * the [[MultimodalOps.ahashBands]] 4×8 banding — incremental acoustic
  * dedup where the corpus is never re-paired from scratch per ingest. */
object AudioDedupIndex {

  def create(spark: SparkSession, root: String): TransactionalTable =
    HammingIndex.create(spark, root)

  def open(spark: SparkSession, root: String): TransactionalTable =
    HammingIndex.open(spark, root)

  /** One batch of media rows (media_id, content): PCM decode → fingerprint
    * → [[HammingIndex.appendBatch]]. Non-WAV / too-short rows are kept,
    * bandless. Returns the kept media ids. */
  def appendBatch(index: TransactionalTable, media: DataFrame, batchId: Long,
      maxDist: Int = 3, compactEvery: Int = 0): DataFrame =
    graft.util.BatchStats.timed("audio_index_batch") {
      HammingIndex.appendBatch(index,
        MultimodalOps.audioHashes(media).withColumnRenamed("ahash", "hash"),
        media.select(col("media_id")), bands = 4, bitsPerBand = 8,
        batchId = batchId, maxDist = maxDist, compactEvery = compactEvery)
    }

  /** Takedown by media id — [[HammingIndex.deleteBatch]]. */
  def deleteBatch(index: TransactionalTable, ids: DataFrame,
      batchId: Long): Unit =
    HammingIndex.deleteBatch(index, ids, batchId)
}
