package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.table.TransactionalTable

/**
 * Persistent IMAGE near-duplicate index — the multimodal twin of
 * [[DedupIndex]], composing the perceptual-hash machinery
 * ([[ImageCodec.dHash]] + [[MultimodalOps.phashBands]]) with the same
 * replay-fenced engine-table lifecycle: incremental LAION-style image dedup
 * where the corpus is never re-paired from scratch per ingest.
 *
 * Each batch of media rows is (1) decoded and hashed, (2) filtered against
 * the index via a banded candidate join REFINED by exact Hamming distance,
 * (3) self-deduped in-batch, (4) its survivors' band signatures appended in
 * ONE replay-fenced commit. Cost per batch: O(batch bands ⋈ index) on the
 * spread (band, chunk) key — never O(corpus²). Unlike the text index's
 * route-to-drop posture, the stored `phash` travels with every band row, so
 * a random 14-bit band collision between genuinely different images never
 * drops a keeper — the exact `bit_count(xor)` gate decides.
 *
 * Dedup rules (deterministic):
 *  - a batch image is a CORPUS dup if any band bucket it lands in holds an
 *    index image within Hamming distance ≤ `maxDist` (banding is exact for
 *    ≤3 by pigeonhole over 4×14 bits);
 *  - among the remainder, an image is an IN-BATCH dup if a surviving image
 *    of smaller media_id sits within `maxDist` in a shared bucket;
 *  - rows whose payload does not decode as an image have no hash — kept,
 *    bandless (they can be neither a dup nor a dup target).
 */
object ImageDedupIndex {

  /** Index row: one per (kept image, band). `sig_id` (md5-60 of
    * "media:band") is the synthetic primary key — buckets repeat. */
  val Schema: StructType = StructType(Seq(
    StructField("sig_id", LongType), StructField("band", LongType),
    StructField("chunk", LongType), StructField("media_id", LongType),
    StructField("phash", LongType)))

  def create(spark: SparkSession, root: String): TransactionalTable =
    TransactionalTable.create(spark, root, Schema, pk = "sig_id", partitionCol = None)

  def open(spark: SparkSession, root: String): TransactionalTable =
    TransactionalTable.open(spark, root)

  /**
   * Filter `media` (media_id, content) against the index + self-dedup,
   * append the survivors' band signatures as batch `batchId`
   * (replay-fenced), and return the kept media ids. Safe to call from
   * `foreachBatch`; `compactEvery = k` bin-packs the index every k-th batch
   * so per-batch join cost stays flat in batch count (same cadence contract
   * as [[DedupIndex.appendBatch]]).
   */
  def appendBatch(index: TransactionalTable, media: DataFrame, batchId: Long,
      maxDist: Int = 3, compactEvery: Int = 0): DataFrame =
    graft.util.BatchStats.timed("image_index_batch") {
      appendBatchInner(index, media, batchId, maxDist, compactEvery)
    }

  private def appendBatchInner(index: TransactionalTable, media: DataFrame,
      batchId: Long, maxDist: Int, compactEvery: Int): DataFrame = {
    val spark = media.sparkSession
    // Decode once — the pixel work is the expensive leg; the corpus filter,
    // the self-join, and the append all reuse the cached bands.
    val bands = MultimodalOps.phashBands(MultimodalOps.imageHashes(media))
      .persist()
    // (1) corpus filter: banded candidates refined by exact Hamming. The
    // index side is the big one — plain shuffle join on the spread
    // (band, chunk) key. Self-matches (same media_id) are excluded so a
    // REPLAYED batch recomputes the identical kept set (the fence makes the
    // re-append a no-op).
    val idx = index.scan().select(col("band"), col("chunk"),
      col("media_id").as("_idx_media"), col("phash").as("_idx_phash"))
    val corpusDup = bands.join(idx,
        bands("band") === idx("band") && bands("chunk") === idx("chunk") &&
          bands("media_id") =!= col("_idx_media") &&
          expr("bit_count(phash ^ _idx_phash)") <= maxDist, "left_semi")
      .select("media_id").distinct()
    val cand = bands.join(corpusDup, Seq("media_id"), "left_anti").persist()
    try {
      // (2) in-batch: smaller media_id within maxDist of a shared bucket wins
      val inBatchDup = cand.as("a").join(cand.as("b"),
          col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
            col("b.media_id") < col("a.media_id") &&
            expr("bit_count(a.phash ^ b.phash)") <= maxDist, "left_semi")
        .select(col("media_id")).distinct()
      // undecodable payloads have no hash — kept, bandless
      val hashless = media.select(col("media_id").cast("long").as("media_id"))
        .join(bands.select("media_id").distinct(), Seq("media_id"), "left_anti")
      // materialized + lineage-truncated: the returned kept set must not
      // recompute against the index AFTER the append advances it
      val keptIds = cand.select("media_id").distinct()
        .join(inBatchDup, Seq("media_id"), "left_anti")
        .unionByName(hashless)
        .localCheckpoint(true)
      // (3) one fenced commit of the survivors' band signatures
      val rows = cand.join(keptIds, Seq("media_id"), "left_semi")
        .select(
          TextOps.md5Hash60(concat_ws(":", col("media_id"), col("band"))).as("sig_id"),
          col("band"), col("chunk"), col("media_id"), col("phash"))
      import spark.implicits._
      index.merge(rows, spark.emptyDataset[Long].toDF("sig_id"), batchId)
      if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
        index.compact()
      keptIds.orderBy("media_id")
    } finally {
      cand.unpersist(blocking = false)
      bands.unpersist(blocking = false)
    }
  }
}
