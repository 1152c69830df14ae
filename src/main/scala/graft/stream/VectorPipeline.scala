package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.AnnIndex

/**
 * Streaming ANN ingest — the VECTOR twin of [[CorpusPipeline]] /
 * [[MediaPipeline]], completing the posture that every persistent
 * pipeline index is maintainable from a micro-batch stream: an incoming
 * embedding stream drives, per micro-batch, one [[AnnIndex.appendBatch]]
 * — assign each vector to its nearest frozen centroid (broadcast literal,
 * map-only) and land the assignments as ONE replay-fenced merge under the
 * micro-batch id.
 *
 * Exactly-once under restart for the same reason as the sibling
 * pipelines: the assignment merge is fenced on the batch id, and the
 * assignment of a vector depends only on the frozen centroids and the
 * vector itself, so a re-delivered epoch recomputes the identical rows
 * and no-ops. The optional DRIFT TRIGGER (`retrainWhenSkew`) rides along:
 * a batch that tips the hottest cell past the threshold retrains the
 * quantizer under the same fence — a replayed batch replays the retrain
 * to a no-op. Per-batch cost is O(batch × cells) compares + one merge —
 * never a function of index size; probes against the index stay
 * manifest-pruned to nprobe cells while the stream appends.
 *
 * The stream envelope is JSON-lines `{vec_id, embedding: [..]}` —
 * float-origin embeddings widen to double exactly, so the streamed
 * assignments bit-match a batch build over the same rows.
 */
object VectorPipeline {

  /** One micro-batch: a fenced assignment merge (+ the optional compaction
    * cadence and drift trigger). With `codes` set (E205), the SAME batch
    * also encodes into the IVF-PQ codes table under its stamped books —
    * the compressed-domain probes stay exactly as fresh as the index.
    *
    * Drift retrain COMPOSES with codes maintenance (E213; through r16
    * wave 4 the combination was guarded off): a retrain moves cells (and,
    * for residual books, the subtraction baseline), invalidating every
    * stored code — so after the ingest step, a codes table that no longer
    * matches the quantizer generation (the E206 fence: a drift retrain
    * just fired, or an earlier rebuild crashed mid-window) is REBUILT in
    * one atomic overwrite before probes can observe it; the rebuild
    * already encodes this batch's rows (the assignment merge landed
    * first), so the per-batch encode is skipped that epoch. Replays stay
    * exactly-once: the assignment merge and the per-batch encode fence on
    * the batch id, the drift trigger's cooldown absorbs the replayed
    * retrain, and a fresh codes table is never rebuilt.
    * Safe to call from `foreachBatch`. */
  def processBatch(h: AnnIndex.Handle, vecs: DataFrame, batchId: Long,
      compactEvery: Int = 0, retrainWhenSkew: Double = 0.0,
      codes: Option[graft.table.TransactionalTable] = None): Unit =
    graft.util.BatchStats.timed("vector_stream_batch") {
      AnnIndex.appendBatch(h, vecs, batchId, compactEvery = compactEvery,
        retrainWhenSkew = retrainWhenSkew)
      codes.foreach { t =>
        if (!graft.ops.PqOps.codesFresh(h, t))
          graft.ops.PqOps.rebuildCodes(h, t)
        else graft.ops.PqOps.appendCodes(h, t, vecs, batchId,
          compactEvery = compactEvery)
      }
    }

  /** The checkpointed stream: JSON-lines `{vec_id, embedding}` landing in
    * `inputDir` → [[processBatch]] per micro-batch. Restarting with the
    * same checkpoint resumes at the first unprocessed file; a re-delivered
    * epoch is fenced to a no-op on the assignment table (and the codes
    * table, when maintained). */
  def run(spark: SparkSession, inputDir: String, checkpointDir: String,
      h: AnnIndex.Handle, compactEvery: Int = 0,
      retrainWhenSkew: Double = 0.0,
      trigger: Trigger = Trigger.AvailableNow(),
      codes: Option[graft.table.TransactionalTable] = None): StreamingQuery =
    spark.readStream
      .schema("vec_id LONG, embedding ARRAY<DOUBLE>")
      .json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, bid: Long) =>
        processBatch(h, df, bid, compactEvery, retrainWhenSkew, codes); ()
      }
      .trigger(trigger)
      .start()
}
