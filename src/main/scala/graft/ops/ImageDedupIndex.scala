package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.table.TransactionalTable

/**
 * Persistent IMAGE near-duplicate index — the multimodal twin of
 * [[DedupIndex]]: the [[HammingIndex]] core over the perceptual-hash
 * machinery ([[ImageCodec.dHash]] + the [[MultimodalOps.phashBands]] 4×14
 * banding), giving incremental LAION-style image dedup where the corpus is
 * never re-paired from scratch per ingest. Dedup rules, replay fencing,
 * compaction cadence, and the exact-Hamming refinement (a random 14-bit
 * band collision between genuinely different images never drops a keeper)
 * all live in the shared core.
 */
object ImageDedupIndex {

  def create(spark: SparkSession, root: String): TransactionalTable =
    HammingIndex.create(spark, root)

  def open(spark: SparkSession, root: String): TransactionalTable =
    HammingIndex.open(spark, root)

  /** One batch of media rows (media_id, content): pixel decode → dHash →
    * [[HammingIndex.appendBatch]]. Rows whose payload does not decode as an
    * image are kept, bandless (they can be neither a dup nor a dup target).
    * Returns the kept media ids. */
  def appendBatch(index: TransactionalTable, media: DataFrame, batchId: Long,
      maxDist: Int = 3, compactEvery: Int = 0): DataFrame =
    graft.util.BatchStats.timed("image_index_batch") {
      HammingIndex.appendBatch(index,
        MultimodalOps.imageHashes(media).withColumnRenamed("phash", "hash"),
        media.select(col("media_id")), bands = 4, bitsPerBand = 14,
        batchId = batchId, maxDist = maxDist, compactEvery = compactEvery)
    }

  /** Takedown by media id — [[HammingIndex.deleteBatch]]. */
  def deleteBatch(index: TransactionalTable, ids: DataFrame,
      batchId: Long): Unit =
    HammingIndex.deleteBatch(index, ids, batchId)
}
