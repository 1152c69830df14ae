package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.{AudioDedupIndex, ImageDedupIndex, VideoDedupIndex}
import graft.table.TransactionalTable

/**
 * Streaming MEDIA corpus build — the multimodal twin of [[CorpusPipeline]]:
 * an incoming stream of opaque media payloads drives, per micro-batch,
 *
 *   1. incremental NEAR-DUP dedup against the persistent Hamming index
 *      ([[ImageDedupIndex]] — perceptual dHash, banded corpus filter +
 *      in-batch rule, survivors' bands appended in a replay-fenced commit;
 *      undecodable payloads are kept, bandless),
 *   2. a replay-fenced MERGE of the kept media rows into the corpus
 *      engine table (binary payload + id — the at-rest layout X5 reads).
 *
 * Exactly-once under restart for the same reason as the text pipeline:
 * both commits are fenced on the micro-batch id, and a re-delivered epoch
 * recomputes the identical kept set (survivors-only index content makes
 * the replay's corpus filter agree with the original in-batch rule), so
 * the corpus end state is independent of delivery count. Per-batch cost is
 * O(batch bands ⋈ index) — never a function of corpus size.
 *
 * The stream envelope is JSON-lines with BASE64 payloads (binary cannot
 * ride raw JSON); the decode to `binary` happens before the batch kernel.
 */
object MediaPipeline {

  /** Corpus row layout: the opaque payload next to its id. */
  val CorpusSchemaDdl = "media_id LONG, content BINARY"

  /** A per-batch dedup kernel: (index, media, batchId, compactEvery) →
    * kept ids. Any [[graft.ops.HammingIndex]] binding fits. */
  type DedupKernel = (TransactionalTable, DataFrame, Long, Int) => DataFrame

  /** Perceptual dHash over decoded pixels (the default). */
  val ImageKernel: DedupKernel =
    (i, m, b, c) => ImageDedupIndex.appendBatch(i, m, b, compactEvery = c)

  /** Gain-invariant energy-delta fingerprint over decoded PCM — the same
    * stream with the acoustic binding. */
  val AudioKernel: DedupKernel =
    (i, m, b, c) => AudioDedupIndex.appendBatch(i, m, b, compactEvery = c)

  /** Per-frame dHash with the time-aligned clip fraction rule — the
    * TEMPORAL binding ([[VideoDedupIndex]]): a batch clip is dropped when
    * ≥ half the shorter side's frames match one indexed clip within
    * Hamming 3. The index table must be created with
    * [[VideoDedupIndex.create]] (frame-position-keyed schema). */
  val VideoKernel: DedupKernel =
    (i, m, b, c) => VideoDedupIndex.appendBatch(i, m, b, compactEvery = c)

  /** One micro-batch: index dedup → fenced corpus commit (→ optional
    * continuous BYTE-budget publication, E192/E202: `publish` ships the
    * corpus interval the export manifest has not seen — sizes dispatch off
    * the BINARY payload type automatically — and `packEvery` folds the
    * interval chain on cadence). Safe to call from `foreachBatch`;
    * replay-safe for a repeated `batchId`. Returns kept ids. */
  def processBatch(index: TransactionalTable, corpus: TransactionalTable,
      media: DataFrame, batchId: Long, compactEvery: Int = 0,
      kernel: DedupKernel = ImageKernel,
      publish: Option[CorpusPipeline.Publish] = None): DataFrame =
    graft.util.BatchStats.timed("media_stream_batch") {
      val spark = media.sparkSession
      import spark.implicits._
      val kept = kernel(index, media, batchId, compactEvery)
      val rows = media.join(kept.select(col("media_id")), Seq("media_id"), "left_semi")
      corpus.merge(rows, spark.emptyDataset[Long].toDF("media_id"), batchId)
      publish.foreach { p =>
        if (p.every <= 1 || batchId % p.every == 0)
          graft.ops.ExportOps.exportLatest(corpus, p.exportRoot,
            p.nShards, p.capacity, idCol = "media_id", textCol = "content")
        if (p.packEvery > 0 && batchId > 0 && batchId % p.packEvery == 0)
          graft.ops.ExportOps.pack(spark, p.exportRoot)
      }
      kept
    }

  /** The checkpointed stream: JSON-lines `{media_id, content_b64}` landing
    * in `inputDir` → [[processBatch]] per micro-batch. Restarting with the
    * same checkpoint resumes at the first unprocessed file; a re-delivered
    * epoch is fenced to a no-op on both tables. */
  def run(spark: SparkSession, inputDir: String, checkpointDir: String,
      index: TransactionalTable, corpus: TransactionalTable,
      compactEvery: Int = 0,
      trigger: Trigger = Trigger.AvailableNow(),
      kernel: DedupKernel = ImageKernel,
      publish: Option[CorpusPipeline.Publish] = None): StreamingQuery =
    spark.readStream
      .schema("media_id LONG, content_b64 STRING")
      .json(inputDir)
      .select(col("media_id"), unbase64(col("content_b64")).as("content"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, bid: Long) =>
        processBatch(index, corpus, df, bid, compactEvery, kernel, publish); ()
      }
      .trigger(trigger)
      .start()
}
