package graft

import graft.ops.ImageDedupIndex

/** Persistent image near-dup index ([[graft.ops.ImageDedupIndex]]): the
  * Hamming-banded perceptual-hash composition of the image codec with the
  * replay-fenced DedupIndex lifecycle. */
class ImageDedupIndexSpec extends SparkSpec {
  import spark.implicits._

  /** 8×8 grayscale gradient image whose dHash is `codeword` replicated
    * across all 8 rows (gray luma = pixel value; one pixel per thumbnail
    * cell): two images with different 7-bit codewords sit at Hamming
    * distance 8·ham7 ≥ 8, far outside maxDist=3; a brightness shift
    * (`base`) never moves a bit. */
  private def gradImage(codeword: Int, base: Int = 100,
      fmt: String = "png"): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (r <- 0 until 8) {
      var v = base
      bi.setRGB(0, r, (v << 16) | (v << 8) | v)
      for (c <- 0 until 7) {
        v += (if (((codeword >> c) & 1) == 1) 10 else -10)
        bi.setRGB(c + 1, r, (v << 16) | (v << 8) | v)
      }
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, fmt, bos)
    bos.toByteArray
  }

  test("appendBatch: corpus dup dropped, replay fence, in-batch dup, non-image kept") {
    val index = ImageDedupIndex.create(spark, tmpDir("img-index") + "/idx")
    // batch 0: two distinct images
    val b0 = Seq((1L, gradImage(0x55)), (2L, gradImage(0x2A)))
      .toDF("media_id", "content")
    assert(ImageDedupIndex.appendBatch(index, b0, 0)
      .as[Long].collect().toSeq === Seq(1L, 2L))
    assert(index.scan().count() === 8L) // 2 images × 4 bands
    // batch 1: a brightness-shifted BMP re-encode of image 1 (corpus dup,
    // distance 0) + a fresh image
    val b1 = Seq((11L, gradImage(0x55, base = 140, fmt = "bmp")),
        (12L, gradImage(0x33)))
      .toDF("media_id", "content")
    assert(ImageDedupIndex.appendBatch(index, b1, 1)
      .as[Long].collect().toSeq === Seq(12L))
    val rowsAfter = index.scan().count()
    assert(rowsAfter === 12L)
    // replayed batch: fence no-ops the append AND the kept set recomputes
    // identically (self-matches excluded from the corpus filter)
    assert(ImageDedupIndex.appendBatch(index, b1, 1)
      .as[Long].collect().toSeq === Seq(12L))
    assert(index.scan().count() === rowsAfter, "replay must not grow the index")
    // in-batch dups: two copies of a fresh image in one batch -> smaller id
    // wins; a non-image payload has no hash and is kept bandless
    val b2 = Seq((20L, gradImage(0x66)), (21L, gradImage(0x66, base = 120)),
        (22L, "definitely not an image".getBytes))
      .toDF("media_id", "content")
    assert(ImageDedupIndex.appendBatch(index, b2, 2)
      .as[Long].collect().toSeq.sorted === Seq(20L, 22L))
  }

  test("HammingIndex: replay returns the ORIGINAL kept set on a transitive in-batch chain") {
    import graft.ops.HammingIndex
    import org.apache.spark.sql.functions.col
    val index = HammingIndex.create(spark, tmpDir("ham-chain") + "/idx")
    // 56-bit space, 4×14 banding: A=0; B flips 2 bits of A's band 0
    // (dist 2 — a pair); C flips 2 bits of B's band 1 (dist 2 from B,
    // dist 4 from A — NOT a pair with A)
    val a = 0L
    val b = a ^ 0x3L
    val c = b ^ (0x3L << 14)
    val hashes = Seq((1L, a), (2L, b), (3L, c)).toDF("media_id", "hash")
    val ids = hashes.select(col("media_id"))
    // single-pass in-batch rule drops 2 (via 1) and 3 (via 2): kept = {1}
    assert(HammingIndex.appendBatch(index, hashes, ids, bands = 4,
      bitsPerBand = 14, batchId = 0).as[Long].collect().toSeq === Seq(1L))
    val n = index.scan().count()
    // replay: the fenced commit no-ops and the read-back returns the
    // ORIGINAL kept set — a recomputation would corpus-filter 2 via the
    // now-indexed 1 and then KEEP chain-orphaned 3 (1≁3)
    assert(HammingIndex.appendBatch(index, hashes, ids, bands = 4,
      bitsPerBand = 14, batchId = 0).as[Long].collect().toSeq === Seq(1L),
      "replay diverged from the committed kept set on a transitive chain")
    assert(index.scan().count() === n, "replay must not grow the index")
  }

  test("lifecycle: compaction cadence bounds files, flat appendBatch, batch-0 dup still caught") {
    val index = ImageDedupIndex.create(spark, tmpDir("img-index-life") + "/idx")
    // 20 ingest batches: one fresh image (distinct codeword per batch, so
    // pairwise Hamming ≥ 8) plus one brightness-shifted re-encode of batch
    // 0's image — the dup must KEEP dropping after any number of
    // compactions (maintenance preserves index content)
    def batchDf(b: Int) = Seq(
      (100L * b + 1, gradImage(b + 1)),
      (100L * b + 2, gradImage(1, base = 130, fmt = "bmp")))
      .toDF("media_id", "content")
    assert(ImageDedupIndex.appendBatch(index, batchDf(0), 0, compactEvery = 4)
      .as[Long].collect().toSeq === Seq(1L))  // in-batch: 2 is 1's dup
    val times = (1 to 19).map { b =>
      val t0 = System.nanoTime()
      val kept = ImageDedupIndex.appendBatch(index, batchDf(b), b, compactEvery = 4)
        .as[Long].collect().toSeq
      assert(kept === Seq(100L * b + 1),
        s"batch $b: fresh image kept, batch-0 dup dropped (post-compaction) — got $kept")
      (System.nanoTime() - t0) / 1e9
    }
    // content: one row set per kept image — 20 fresh images × 4 bands
    assert(index.scan().select("media_id").distinct().count() === 20L)
    // file count bounded by the compaction interval, not total batch count
    val nFiles = graft.table.TransactionalTable.open(spark, index.root)
      .snapshot.files.length
    assert(nFiles <= 8, s"compaction cadence must bound the file count, got $nFiles")
    // flatness: per-batch wall time must not grow with batch count
    val first = times.slice(0, 5).sum / 5
    val last = times.slice(14, 19).sum / 5
    assert(last <= first * 3.0,
      f"appendBatch wall time grew: first5=$first%.2fs last5=$last%.2fs")
  }

  test("VideoDedupIndex: clip fraction rule across the index boundary; single-frame overlap kept; replay fenced") {
    import graft.ops.{ImageCodec, VideoDedupIndex}
    def frame(codeword: Int, base: Int): java.awt.image.BufferedImage = {
      val bi = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (r <- 0 until 8) {
        var v = base
        bi.setRGB(0, r, (v << 16) | (v << 8) | v)
        for (c <- 0 until 7) {
          v += (if (((codeword >> c) & 1) == 1) 10 else -10)
          bi.setRGB(c + 1, r, (v << 16) | (v << 8) | v)
        }
      }
      bi
    }
    def gif(codewords: Seq[Int], base: Int): Array[Byte] =
      ImageCodec.writeGifAnimationImages(codewords.map(frame(_, base)))
    val index = VideoDedupIndex.create(spark, tmpDir("vid-index") + "/idx")
    // batch 0: one three-frame clip
    assert(VideoDedupIndex.appendBatch(index,
        Seq((1L, gif(Seq(0x55, 0x33, 0x0F), 100))).toDF("media_id", "content"), 0)
      .as[Long].collect().toSeq === Seq(1L))
    val b1 = Seq(
      (11L, gif(Seq(0x55, 0x33, 0x0F), 140)), // 3/3 vs clip 1: corpus dup
      (12L, gif(Seq(0x55, 0x33, 0x11), 100)), // 2/3: corpus dup (fraction rule)
      (15L, gif(Seq(0x33, 0x33, 0x33), 100)), // 1/3 aligned overlap: kept
      (16L, gif(Seq(0x33, 0x33, 0x33), 120)), // in-batch 3/3 of 15: dropped
      (17L, "not a video".getBytes))          // frameless: kept
      .toDF("media_id", "content")
    assert(VideoDedupIndex.appendBatch(index, b1, 1)
      .as[Long].collect().toSeq === Seq(15L, 17L))
    // index holds survivors only: clips 1 and 15, 3 frames × 4 bands each
    assert(index.scan().select("media_id").distinct()
      .as[Long].collect().toSet === Set(1L, 15L))
    assert(index.scan().count() === 24L)
    // replayed epoch: identical kept set, no new commit
    val v = graft.table.TransactionalTable.open(spark, index.root).currentVersion
    assert(VideoDedupIndex.appendBatch(index, b1, 1)
      .as[Long].collect().toSeq === Seq(15L, 17L))
    assert(graft.table.TransactionalTable.open(spark, index.root).currentVersion === v)
  }

  test("AudioDedupIndex: the same HammingIndex core over the energy-delta fingerprint") {
    import graft.ops.{AudioDedupIndex, WavCodec}
    def wav(pattern: Long, div: Int): Array[Byte] = {
      val v = new Array[Int](33)
      v(0) = 2000
      for (k <- 0 until 32)
        v(k + 1) = v(k) + (if (((pattern >> k) & 1L) == 1L) 400 else -400)
      WavCodec.write(v.flatMap(x => Array.fill(8)(x / div)), 1, 8000, 16)
    }
    val pA = 0x55555555L
    val pE = 0x33333333L
    val index = AudioDedupIndex.create(spark, tmpDir("aud-index") + "/idx")
    assert(AudioDedupIndex.appendBatch(index,
        Seq((1L, wav(pA, 1))).toDF("media_id", "content"), 0)
      .as[Long].collect().toSeq === Seq(1L))
    // batch 1: half-volume corpus dup of 1 dropped; fresh kept; its
    // in-batch volume copy dropped; non-WAV kept hashless
    val b1 = Seq(
      (11L, wav(pA, 2)),
      (15L, wav(pE, 1)),
      (16L, wav(pE, 2)),
      (17L, "not audio".getBytes)).toDF("media_id", "content")
    assert(AudioDedupIndex.appendBatch(index, b1, 1)
      .as[Long].collect().toSeq === Seq(15L, 17L))
    // replay fence: re-delivered batch recomputes the identical kept set,
    // index version does not advance
    val v = graft.table.TransactionalTable.open(spark, index.root).currentVersion
    assert(AudioDedupIndex.appendBatch(index, b1, 1)
      .as[Long].collect().toSeq === Seq(15L, 17L))
    assert(graft.table.TransactionalTable.open(spark, index.root).currentVersion === v)
  }
}
