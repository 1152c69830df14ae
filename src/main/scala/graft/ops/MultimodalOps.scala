package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal record: opaque payload + typed metadata. At rest this is a
  * Parquet `binary` column next to scalar metadata — the layout that scales
  * (Parquet stores/streams large binaries page-wise; metadata columns stay
  * prunable without touching payload pages). */
final case class MediaRecord(
    media_id: Long, kind: String, content: Array[Byte], width: Int, height: Int)

/** Decoder output: fixed-shape features per record. */
final case class MediaFeatures(
    media_id: Long, kind: String, n_bytes: Long, byte_mean: Double,
    n_frames: Int, feature: Array[Float])

/**
 * X5: multimodal column plumbing — image/audio/video as opaque `binary`
 * columns with typed metadata, plus a batched decode / feature-extract /
 * frame-sample stage.
 *
 * The decode kernel itself is a STUB: real codecs (JPEG/PNG/ffmpeg) are not in
 * this container, so `decodeFeatures` runs a deterministic fake decoder
 * (byte-histogram features + stride frame sampling). Everything around it —
 * the schema, the `Dataset[MediaRecord]` encoder, per-partition batched
 * iteration (`mapPartitions`, the JVM analogue of `mapInPandas` batches), and
 * size-aware repartitioning — is real and tested; swapping in a codec touches
 * only the marked function.
 */
object MultimodalOps {

  /** Synthesize a media table from the `documents` fixture: UTF-8 payload as
    * the opaque binary, text metadata as width/height stand-ins. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("text").as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      length(col("text")).cast("int").as("width"),
      lit(1).as("height"))

  /** ======== STUB DECODER ========
    * Deterministic fake standing in for a real codec. Pure function of the
    * payload bytes: 16-bin byte histogram (L1-normalized) as the "feature",
    * mean byte value, and every-`frameStride`-th byte as a sampled "frame". */
  private def fakeDecode(r: MediaRecord, frameStride: Int): MediaFeatures = {
    val bytes = r.content
    val n = bytes.length
    val hist = new Array[Float](16)
    var sum = 0L
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xff
      hist(b >> 4) += 1f
      sum += b
      i += 1
    }
    if (n > 0) { var j = 0; while (j < 16) { hist(j) /= n.toFloat; j += 1 } }
    val frames = if (n == 0) 0 else (n + frameStride - 1) / frameStride
    MediaFeatures(r.media_id, r.kind, n.toLong,
      if (n == 0) 0.0 else sum.toDouble / n, frames, hist)
  }

  /**
   * Batched decode stage. `mapPartitions` hands each task one iterator over
   * its partition — records are decoded in-sequence without per-row task
   * overhead, the JVM shape of a Pandas-UDF batch. Partitioning upstream
   * should balance *bytes*, not rows (see [[repartitionBySize]]), because
   * decode cost follows payload size.
   */
  def decodeFeatures(media: Dataset[MediaRecord], frameStride: Int = 4096): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(fakeDecode(_, frameStride)))
  }

  /** Byte-balanced repartitioning ahead of decode: range-partition on a
    * size-bucketed key so a few huge payloads don't skew one task. */
  def repartitionBySize(media: DataFrame, partitions: Int): DataFrame =
    media.withColumn("_sz", length(col("content")))
      .repartitionByRange(partitions, col("_sz"), col("media_id"))
      .drop("_sz")

  /** Typed view of a media DataFrame. */
  def asRecords(media: DataFrame): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord]
  }

  /** End-to-end: documents → media table → byte-balanced partitions →
    * batched fake decode, as a plain DataFrame of features. */
  def documentFeatures(docs: DataFrame, partitions: Int = 32): DataFrame =
    decodeFeatures(asRecords(repartitionBySize(fromDocuments(docs), partitions)))
      .toDF()

  /**
   * Frame sampling: explode each payload into its every-`frameStride`-th byte
   * as (media_id, frame_idx, frame_byte) rows — the video-frame-sample shape
   * (a real codec would emit decoded frames here; the byte stand-in keeps the
   * exploded row layout, batching, and downstream schema identical). Output
   * cardinality is Σ ceil(n_bytes / stride), so the stride is the row-blowup
   * knob at scale.
   */
  def sampleFrames(media: Dataset[MediaRecord], frameStride: Int = 256): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      Range(0, r.content.length, frameStride).map(i =>
        (r.media_id, (i / frameStride).toLong, (r.content(i) & 0xff).toLong))
    }.toDF("media_id", "frame_idx", "frame_byte")
  }
}
