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
 * The decode kernels are REAL for images, audio, and multi-frame video
 * stand-ins: [[ImageCodec]] hand-parses the container headers
 * (PNG/JPEG/GIF/BMP) and fully decodes pixels through the JDK's built-in
 * `javax.imageio` readers (including per-frame decode of animated GIFs, the
 * one multi-frame format with a pure-JVM codec); [[WavCodec]] hand-parses
 * RIFF/WAVE and decodes PCM samples with plain integer arithmetic. No
 * native libraries anywhere, so both run in any executor container. Other
 * payloads (plain text; compressed audio/video whose codecs genuinely
 * aren't in this container) fall back to the deterministic byte-statistics
 * decoder, keeping every record decodable. The plumbing — schema,
 * `Dataset[MediaRecord]` encoder, per-partition batched iteration
 * (`mapPartitions`, the JVM analogue of `mapInPandas` batches), size-aware
 * repartitioning — is shared by all paths.
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

  /** Byte-statistics decoder — the fallback for payloads with no JVM codec
    * (text/audio/video): 16-bin byte histogram (L1-normalized) as the
    * feature, mean byte value, every-`frameStride`-th byte as a "frame". */
  private def byteDecode(r: MediaRecord, frameStride: Int): MediaFeatures = {
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
    media.mapPartitions(_.map { r =>
      // Real pixel decode when the payload IS an image (header-probed), real
      // PCM decode when it is a WAV; byte statistics otherwise. All three
      // emit the same fixed feature shape.
      ImageCodec.decode(r.content) match {
        case Some(img) => MediaFeatures(r.media_id, r.kind, r.content.length.toLong,
          img.meanLuma, 1, img.lumaHist)
        case None => WavCodec.decode(r.content) match {
          case Some(a) => MediaFeatures(r.media_id, r.kind, r.content.length.toLong,
            a.meanAbs, math.min(Int.MaxValue.toLong, a.meta.nFrames).toInt, a.ampHist)
          case None => byteDecode(r, frameStride)
        }
      }
    })
  }

  /** Audio-table decode: full typed output of the REAL PCM codec (format
    * header + exact sample statistics) for rows whose payload parses as a
    * PCM WAV; non-audio rows are dropped. Same batched `mapPartitions`
    * shape as [[decodeFeatures]]. */
  def decodeAudio(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        WavCodec.decode(bytes).map { a =>
          (id, a.meta.channels, a.meta.sampleRate, a.meta.bitsPerSample,
            a.meta.nFrames, a.durationMs, a.meanAbs, a.rms, a.peak.toLong,
            a.zeroCrossings)
        }
      })
      .toDF("media_id", "channels", "sample_rate", "bits", "n_frames",
        "duration_ms", "mean_abs", "rms", "peak", "zero_crossings")
  }

  /** REAL video-frame sampling: decode each payload's frames (animated GIF —
    * the one multi-frame format with a pure-JVM codec) and keep every
    * `stride`-th frame with its exact mean luma. Non-multi-frame payloads
    * contribute their single frame at index 0; undecodable rows are dropped.
    * Output cardinality is Σ ceil(n_frames / stride) — the same row-blowup
    * knob as the byte-stride stand-in. */
  def sampleRealFrames(media: DataFrame, stride: Int = 1): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        ImageCodec.frames(bytes).iterator
          .filter(_.frameIdx % stride == 0)
          .map(f => (id, f.frameIdx.toLong, f.width, f.height, f.meanLuma))
      })
      .toDF("media_id", "frame_idx", "width", "height", "mean_luma")
  }

  /** Image-table decode: full typed output of the REAL codec (container
    * format + true dimensions + exact pixel statistics + 8×8 thumbnail) for
    * rows whose payload parses as an image; non-images are dropped. Same
    * batched `mapPartitions` shape as [[decodeFeatures]]. */
  def decodeImages(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        ImageCodec.decode(bytes).map { d =>
          (id, d.meta.format, d.meta.width, d.meta.height, d.meanLuma,
            d.channelMeans(0), d.channelMeans(1), d.channelMeans(2), d.thumb)
        }
      })
      .toDF("media_id", "format", "width", "height", "mean_luma",
        "mean_r", "mean_g", "mean_b", "thumb")
  }

  /** Per-image perceptual hash: decode → 8×8 thumbnail → 56-bit
    * [[ImageCodec.dHash]]. Same batched `mapPartitions` shape as
    * [[decodeImages]]; non-image rows are dropped. One Long per image —
    * the fixed-width key all downstream dedup machinery joins on. */
  def imageHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        ImageCodec.decode(bytes).map(d => (id, ImageCodec.dHash(d.thumb)))
      })
      .toDF("media_id", "phash")
  }

  /** Pigeonhole banding of the 56-bit perceptual hash: 4 bands of 14 bits —
    * any pair within Hamming distance 3 agrees on ≥1 band (the
    * LAION-style image-dedup twin of [[DedupOps.simhashBands]]). */
  def phashBands(hashes: DataFrame): DataFrame =
    hashes.select(col("media_id"), col("phash"),
        explode(expr(
          "transform(sequence(0, 3), c -> named_struct('band', c, 'chunk', (phash >> (c * 14)) & 16383))"
        )).as("x"))
      .select(col("media_id"), col("phash"), col("x.band").cast("long").as("band"),
        col("x.chunk").as("chunk"))

  /**
   * Image near-duplicate pairs with perceptual-hash Hamming distance ≤
   * `maxDist` (default 3): decode → dHash → banded candidate join → exact
   * `bit_count` filter. Candidates come from an equi-join on (band, chunk),
   * never all-pairs — at corpus scale the shuffle carries (media_id, phash,
   * band, chunk) rows, and only hash-colliding bucket members ever meet.
   * Brightness-shifted and losslessly re-encoded copies land at distance 0;
   * genuinely different images disagree in every band and never pair.
   */
  def imageNearDupPairs(media: DataFrame, maxDist: Int = 3): DataFrame = {
    val chunked = phashBands(imageHashes(media))
    chunked.as("a").join(chunked.as("b"),
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        col("a.phash").as("ph_a"), col("b.phash").as("ph_b"))
      .dropDuplicates("media_a", "media_b")
      .withColumn("hamming", expr("bit_count(ph_a ^ ph_b)"))
      .filter(col("hamming") <= maxDist)
      .select("media_a", "media_b", "hamming")
      .orderBy("media_a", "media_b")
  }

  /** Per-clip acoustic fingerprint: PCM decode → 33-window energy-delta
    * hash ([[WavCodec.fingerprint]]). Same batched `mapPartitions` shape as
    * [[imageHashes]]; non-WAV / too-short rows are dropped. One Long per
    * clip — the fixed-width key the Hamming machinery joins on. */
  def audioHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        WavCodec.fingerprint(bytes).map(h => (id, h))
      })
      .toDF("media_id", "ahash")
  }

  /** Pigeonhole banding of the 32-bit acoustic fingerprint: 4 bands of
    * 8 bits — any pair within Hamming distance 3 agrees on ≥ 1 band
    * (same guarantee as [[phashBands]], narrower hash). */
  def ahashBands(hashes: DataFrame): DataFrame =
    hashes.select(col("media_id"), col("ahash"),
        explode(expr(
          "transform(sequence(0, 3), c -> named_struct('band', c, 'chunk', (ahash >> (c * 8)) & 255))"
        )).as("x"))
      .select(col("media_id"), col("ahash"), col("x.band").cast("long").as("band"),
        col("x.chunk").as("chunk"))

  /**
   * Audio near-duplicate pairs with fingerprint Hamming distance ≤
   * `maxDist` (default 3): PCM decode → energy-delta hash → banded
   * candidate join → exact `bit_count` filter — the audio modality of the
   * image pipeline above, same never-all-pairs shape. Volume-scaled copies
   * land at distance 0 (the delta hash is gain-invariant); localized edits
   * land within `maxDist`; different material disagrees in every band and
   * never pairs.
   */
  def audioNearDupPairs(media: DataFrame, maxDist: Int = 3): DataFrame = {
    val chunked = ahashBands(audioHashes(media))
    chunked.as("a").join(chunked.as("b"),
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        col("a.ahash").as("ah_a"), col("b.ahash").as("ah_b"))
      .dropDuplicates("media_a", "media_b")
      .withColumn("hamming", expr("bit_count(ah_a ^ ah_b)"))
      .filter(col("hamming") <= maxDist)
      .select("media_a", "media_b", "hamming")
      .orderBy("media_a", "media_b")
  }

  /** Per-frame perceptual hashes of every clip: (media_id, pos, fhash) —
    * real frame decode ([[ImageCodec.frameDHashes]]) sampled every
    * `stride`-th frame. Non-video/undecodable payloads contribute no rows.
    * Same batched `mapPartitions` shape as [[imageHashes]]. */
  def videoFrameHashes(media: DataFrame, stride: Int = 1): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        ImageCodec.frameDHashes(bytes).iterator
          .filter(_._1 % stride == 0)
          .map { case (idx, h) => (id, idx.toLong, h) }
      })
      .toDF("media_id", "pos", "fhash")
  }

  /**
   * VIDEO near-duplicate pairs: clips whose time-aligned sampled frames
   * match (per-frame dHash within Hamming `maxDist`) at ≥ `minMatchFrac`
   * of the shorter clip's sampled frames — the temporal composition of
   * the image pipeline. Candidates come from an equi-join on
   * (pos, band, chunk): the frame POSITION rides the bucket key, so only
   * time-aligned hash-colliding frames ever meet — never all-pairs, never
   * cross-position blowup. Re-encoded / brightness-shifted copies match
   * every frame; a partial edit keeps matching outside the edited span;
   * different material never pairs.
   */
  def videoNearDupPairs(media: DataFrame, maxDist: Int = 3, stride: Int = 1,
      minMatchFrac: Double = 0.5): DataFrame = {
    require(minMatchFrac > 0 && minMatchFrac <= 1, "minMatchFrac in (0, 1]")
    val fh = videoFrameHashes(media, stride)
    val counts = fh.groupBy("media_id").agg(count(lit(1)).as("n"))
    val ch = fh.select(col("media_id"), col("pos"), col("fhash"),
        explode(expr(
          "transform(sequence(0, 3), c -> named_struct('band', c, 'chunk', (fhash >> (c * 14)) & 16383))"
        )).as("x"))
      .select(col("media_id"), col("pos"), col("fhash"),
        col("x.band").cast("long").as("band"), col("x.chunk").as("chunk"))
    val matched = ch.as("a").join(ch.as("b"),
        col("a.pos") === col("b.pos") && col("a.band") === col("b.band") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        col("a.pos").as("pos"), col("a.fhash").as("fa"), col("b.fhash").as("fb"))
      .dropDuplicates("media_a", "media_b", "pos")
      .filter(expr("bit_count(fa ^ fb)") <= maxDist)
      .groupBy("media_a", "media_b").agg(count(lit(1)).as("n_matched"))
    matched
      .join(counts.select(col("media_id").as("media_a"), col("n").as("n_a")), "media_a")
      .join(counts.select(col("media_id").as("media_b"), col("n").as("n_b")), "media_b")
      .filter(col("n_matched") >= ceil(least(col("n_a"), col("n_b")) * lit(minMatchFrac)))
      .select(col("media_a"), col("media_b"), col("n_matched"),
        least(col("n_a"), col("n_b")).as("n_frames"))
      .orderBy("media_a", "media_b")
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
