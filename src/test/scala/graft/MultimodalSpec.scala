package graft

import org.apache.spark.sql.functions._

import graft.ops.MultimodalOps

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello world"),
    (2L, ""),
    (3L, "x" * 10000)).toDF("doc_id", "text")

  test("fromDocuments: binary payload + typed metadata schema") {
    val m = MultimodalOps.fromDocuments(docs)
    assert(m.schema("content").dataType === org.apache.spark.sql.types.BinaryType)
    val r = m.filter($"media_id" === 1).select($"width", length($"content"))
      .as[(Int, Int)].head()
    assert(r === ((11, 11)))
  }

  test("decodeFeatures: deterministic, fixed shape, empty payload safe") {
    val f = MultimodalOps.documentFeatures(docs, partitions = 3)
    val rows = f.select($"media_id", $"n_bytes", $"byte_mean", $"n_frames", size($"feature"))
      .as[(Long, Long, Double, Int, Int)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 3L))
    val Seq(r1, r2, r3) = rows.toSeq
    assert(r1._2 === 11L && r1._5 === 16)
    assert(r2 === ((2L, 0L, 0.0, 0, 16)))                  // empty payload
    assert(r3._2 === 10000L && r3._4 === 3 && r3._3 === 'x'.toInt.toDouble)
    // determinism
    val again = MultimodalOps.documentFeatures(docs, partitions = 3)
      .select($"media_id", $"byte_mean").as[(Long, Double)].collect().toMap
    assert(again === rows.map(r => r._1 -> r._3).toMap)
  }

  test("histogram feature is L1-normalized over 16 bins") {
    val f = MultimodalOps.documentFeatures(docs.filter($"doc_id" === 3))
      .select($"feature").as[Seq[Float]].head()
    assert(math.abs(f.sum - 1.0f) < 1e-5)
    assert(f('x'.toInt >> 4) === 1.0f) // all bytes land in one bin
  }

  // ---- real image codec (ImageCodec: hand-parsed headers + ImageIO pixels) ----

  private def mkImage(w: Int, h: Int, rgb: Int, fmt: String): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) bi.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, fmt, bos)
    bos.toByteArray
  }

  test("ImageCodec.probe parses real PNG/JPEG/GIF/BMP headers exactly") {
    import graft.ops.ImageCodec
    val png = ImageCodec.probe(mkImage(13, 9, 0x336699, "png")).get
    assert(png.format === "png" && png.width === 13 && png.height === 9 && png.channels === 3)
    val jpg = ImageCodec.probe(mkImage(31, 17, 0x808080, "jpg")).get
    assert(jpg.format === "jpeg" && jpg.width === 31 && jpg.height === 17 && jpg.channels === 3)
    val gif = ImageCodec.probe(mkImage(7, 5, 0xff0000, "gif")).get
    assert(gif.format === "gif" && gif.width === 7 && gif.height === 5)
    val bmp = ImageCodec.probe(mkImage(4, 11, 0x010203, "bmp")).get
    assert(bmp.format === "bmp" && bmp.width === 4 && bmp.height === 11)
    // text payloads (even 'BM'-prefixed ones) never decode as images
    assert(ImageCodec.probe("plain old text, nothing binary here".getBytes).isEmpty)
    assert(ImageCodec.decode("BMoreover this text starts with BM..".getBytes).isEmpty)
  }

  test("ImageCodec.decode: exact pixel statistics on constant-color images") {
    import graft.ops.ImageCodec
    // rgb(32,64,96): BT.601 integer luma = (77*32 + 150*64 + 29*96) >> 8 = 58
    val d = ImageCodec.decode(mkImage(10, 6, (32 << 16) | (64 << 8) | 96, "png")).get
    assert(d.meta.width === 10 && d.meta.height === 6)
    assert(d.meanLuma === 58.0)
    assert(d.channelMeans.toSeq === Seq(32.0, 64.0, 96.0))
    assert(d.lumaHist(58 >> 4) === 1.0f && math.abs(d.lumaHist.sum - 1.0f) < 1e-5)
    // thumbnail: with h=6 < 8 some grid rows receive no pixels (0f); every
    // POPULATED cell averages the constant. A >=8x8 image fills all 64.
    assert(d.thumb.forall(v => v === 58.0f || v === 0.0f) && d.thumb.contains(58.0f))
    val big = ImageCodec.decode(mkImage(16, 16, (32 << 16) | (64 << 8) | 96, "png")).get
    assert(big.thumb.forall(_ === 58.0f))
  }

  test("decodeFeatures routes images through the real codec, text through bytes") {
    val png = mkImage(8, 8, (32 << 16) | (64 << 8) | 96, "png")
    val media = Seq(
      (1L, "image", png, 8, 8),
      (2L, "text", "hello".getBytes("UTF-8"), 5, 1))
      .toDF("media_id", "kind", "content", "width", "height")
    val f = MultimodalOps.decodeFeatures(MultimodalOps.asRecords(media))
      .toDF().select($"media_id", $"byte_mean").as[(Long, Double)].collect().toMap
    assert(f(1L) === 58.0, "image payload must yield pixel luma, not byte stats")
    assert(f(2L) === "hello".getBytes.map(_ & 0xff).sum.toDouble / 5, "text stays byte path")
    // distributed image decode with typed output
    val imgs = MultimodalOps.decodeImages(media)
    val row = imgs.filter($"media_id" === 1)
      .select($"format", $"width", $"height", $"mean_r").as[(String, Int, Int, Double)].head()
    assert(row === (("png", 8, 8, 32.0)))
    assert(imgs.count() === 1L) // the text row is not an image
  }

  // ---- real audio codec (WavCodec: hand-parsed RIFF + PCM arithmetic) ----

  test("WavCodec: exact round-trip statistics, 8/16-bit, mono/stereo") {
    import graft.ops.WavCodec
    // 16-bit mono square wave: every stat closed-form
    val sq = WavCodec.decode(WavCodec.write(
      Array.tabulate(1000)(i => if (i % 2 == 0) 2000 else -2000), 1, 8000, 16)).get
    assert(sq.meta === graft.ops.WavMeta(1, 8000, 16, 1000))
    assert(sq.meanAbs === 2000.0 && sq.rms === 2000.0 && sq.peak === 2000)
    assert(sq.zeroCrossings === 999L && sq.durationMs === 125.0)
    // stereo: zero crossings count channel 0 only
    val st = WavCodec.decode(WavCodec.write(
      Array.tabulate(20)(i => if (i % 2 == 0) 1000 else -1000), 2, 44100, 16)).get
    assert(st.meta.channels === 2 && st.meta.nFrames === 10L)
    assert(st.zeroCrossings === 0L && st.meanAbs === 1000.0)
    // 8-bit: stored unsigned, centered on decode
    val m8 = WavCodec.decode(WavCodec.write(Array.fill(16)(-5), 1, 8000, 8)).get
    assert(m8.meta.bitsPerSample === 8 && m8.meanAbs === 5.0 && m8.peak === 5)
    // histogram is L1-normalized and lands in the right bin
    assert(math.abs(m8.ampHist.sum - 1.0f) < 1e-5)
    assert(m8.ampHist((-5 + 128) >> 4) === 1.0f)
  }

  test("WavCodec.write saturates out-of-range samples at both bit depths") {
    import graft.ops.WavCodec
    // 8-bit stores unsigned bytes: unclamped (300 + 128).toByte would WRAP
    // to a different amplitude; it must saturate to [-128, 127] instead
    val d8 = WavCodec.decode(WavCodec.write(Array(300, -300), 1, 8000, 8)).get
    assert(d8.peak === 128 && d8.meanAbs === 127.5)
    val d16 = WavCodec.decode(WavCodec.write(Array(40000, -40000), 1, 8000, 16)).get
    assert(d16.peak === 32768 && d16.meanAbs === 32767.5)
  }

  test("WavCodec refuses non-PCM / malformed payloads instead of misdecoding") {
    import graft.ops.WavCodec
    assert(WavCodec.probe("RIFFxxxxWAVE but then garbage follows here".getBytes).isEmpty)
    assert(WavCodec.probe("definitely not audio content at all!!!!!!!!!!".getBytes).isEmpty)
    // a valid WAV with the format code flipped to 2 (ADPCM) must refuse
    val ok = WavCodec.write(Array.fill(64)(100), 1, 8000, 16)
    ok(20) = 2 // audioFormat LE16 at offset 20
    assert(WavCodec.probe(ok).isEmpty)
    // truncated data chunk (declared size past the payload) must refuse
    val trunc = WavCodec.write(Array.fill(64)(100), 1, 8000, 16).dropRight(8)
    assert(WavCodec.probe(trunc).isEmpty)
    // hostile chunk size near Int.MaxValue must refuse, not overflow past
    // the bounds check and crash
    val hostile = WavCodec.write(Array.fill(64)(100), 1, 8000, 16)
    hostile(16) = -1; hostile(17) = -1; hostile(18) = -1; hostile(19) = 0x7f // fmt size = 0x7fffffff
    assert(WavCodec.probe(hostile).isEmpty)
    // an ODD-sized unknown chunk before fmt/data is word-padded per RIFF —
    // the walk must skip the pad byte and still find the payload
    val base = WavCodec.write(Array.fill(8)(100), 1, 8000, 16)
    val odd = java.nio.ByteBuffer.allocate(base.length + 10)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    odd.put(base, 0, 12) // RIFF....WAVE
    odd.put("JUNK".getBytes("US-ASCII")).putInt(1).put(9.toByte).put(0.toByte) // odd chunk + pad
    odd.put(base, 12, base.length - 12)
    val bytes = odd.array()
    // patch the RIFF size (unchecked by the parser, but keep it honest)
    val d = WavCodec.decode(bytes)
    assert(d.exists(_.meta.nFrames == 8L), s"odd-chunk walk failed: $d")
  }

  test("decodeAudio + decodeFeatures route WAV payloads through the PCM codec") {
    import graft.ops.WavCodec
    val wav = WavCodec.write(Array.tabulate(500)(i => if (i % 2 == 0) 300 else -300), 1, 8000, 16)
    val media = Seq(
      (1L, "audio", wav, 0, 0),
      (2L, "text", "hello".getBytes("UTF-8"), 5, 1))
      .toDF("media_id", "kind", "content", "width", "height")
    val a = MultimodalOps.decodeAudio(media)
    assert(a.count() === 1L) // text is not audio
    val r = a.select($"sample_rate", $"n_frames", $"mean_abs", $"zero_crossings")
      .as[(Int, Long, Double, Long)].head()
    assert(r === ((8000, 500L, 300.0, 499L)))
    // the generic feature path picks the PCM decode for the WAV row
    val f = MultimodalOps.decodeFeatures(MultimodalOps.asRecords(media))
      .toDF().select($"media_id", $"byte_mean", $"n_frames")
      .as[(Long, Double, Int)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(f(1L) === ((300.0, 500)))
  }

  // ---- real multi-frame decode (animated GIF as the video stand-in) ----

  test("ImageCodec.frames: exact per-frame stats of an animated GIF") {
    import graft.ops.ImageCodec
    val gif = ImageCodec.writeGifAnimation(6, 4, Seq(
      (10 << 16) | (20 << 8) | 30, 0xc8c8c8, 0x0000ff))
    val fs = ImageCodec.frames(gif)
    assert(fs.map(_.frameIdx) === Seq(0, 1, 2))
    assert(fs.forall(f => f.width === 6 && f.height === 4))
    assert(fs.map(_.meanLuma) === Seq(18.0, 200.0, 28.0))
    // a single-frame PNG yields exactly one frame
    val one = ImageCodec.frames(mkImage(5, 5, 0xffffff, "png"))
    assert(one.map(f => (f.frameIdx, f.meanLuma)) === Seq((0, 255.0)))
    // non-image payloads yield nothing
    assert(ImageCodec.frames("not an image at all, sorry".getBytes).isEmpty)
  }

  test("sampleRealFrames: distributed frame sampling with stride") {
    import graft.ops.ImageCodec
    val gif = ImageCodec.writeGifAnimation(6, 4, Seq(
      (10 << 16) | (20 << 8) | 30, 0xc8c8c8, 0x0000ff, 0xff0000, 0x00ff00))
    val media = Seq((1L, gif)).toDF("media_id", "content")
    val fs = MultimodalOps.sampleRealFrames(media, stride = 2)
      .select($"frame_idx", $"mean_luma").as[(Long, Double)].collect().sortBy(_._1)
    assert(fs.toSeq === Seq((0L, 18.0), (2L, 28.0), (4L, 149.0)))
  }

  // ---- image near-dup: perceptual hash + Hamming-banded pairing ----

  /** Deterministic "natural" color image: pixel (x,y) channels follow a
    * smooth pattern with values in [40, 208] (shift-safe, no clamping). */
  private def patternImage(w: Int, h: Int, shift: Int, fmt: String,
      variant: Int = 0): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = 40 + ((x * 7 + y * 3 + variant * 11) % 160) + shift
      val g = 40 + ((x * 2 + y * 13 + variant * 29) % 160) + shift
      val b = 40 + ((x * 5 + y * 5 + variant * 47) % 160) + shift
      bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, fmt, bos)
    bos.toByteArray
  }

  test("dHash: closed-form value on 8x8 grayscale gradient; brightness/re-encode invariant") {
    import graft.ops.ImageCodec
    // 8×8 gray gradient: row r starts at base, steps ±10 by bit c of rowBits(r).
    // Gray pixel v has luma exactly v, and each thumbnail cell is one pixel,
    // so the dHash is the rowBits pattern verbatim.
    def gray(rowBits: Seq[Int], base: Int, fmt: String): Array[Byte] = {
      val bi = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (r <- 0 until 8) {
        var v = base
        bi.setRGB(0, r, (v << 16) | (v << 8) | v)
        for (c <- 0 until 7) {
          v += (if (((rowBits(r) >> c) & 1) == 1) 10 else -10)
          bi.setRGB(c + 1, r, (v << 16) | (v << 8) | v)
        }
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, fmt, bos)
      bos.toByteArray
    }
    val bitsA = Seq(0x55, 0x2A, 0x55, 0x2A, 0x55, 0x2A, 0x55, 0x2A)
    val expected = bitsA.zipWithIndex.map { case (b, r) => b.toLong << (7 * r) }.sum
    assert(expected === 24019198012642645L) // the oracle's pinned literal
    val hA = ImageCodec.dHash(ImageCodec.decode(gray(bitsA, 100, "png")).get.thumb)
    assert(hA === expected)
    // brightness shift and lossless re-encode leave every bit unchanged
    val hShift = ImageCodec.dHash(ImageCodec.decode(gray(bitsA, 140, "bmp")).get.thumb)
    assert(hShift === hA)
  }

  test("imageNearDupPairs: re-encoded + brightness-shifted copies found, distinct images not") {
    val media = Seq(
      (1L, patternImage(64, 48, 0, "png")),          // original
      (2L, patternImage(64, 48, 0, "bmp")),          // lossless re-encode
      (3L, patternImage(64, 48, 20, "png")),         // +20 brightness
      (4L, patternImage(64, 48, 0, "png", variant = 3)), // genuinely different
      (5L, "not an image".getBytes)                  // non-image: dropped
    ).toDF("media_id", "content")
    val pairs = MultimodalOps.imageNearDupPairs(media, maxDist = 3)
      .as[(Long, Long, Int)].collect().toSet
    // luma shifts by exactly the brightness delta ((S + 256δ)>>8 = (S>>8)+δ),
    // so copies 2 and 3 hash identically to 1: all three pair at distance 0
    assert(pairs === Set((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0)))
    // the distinct image pairs with nothing
    assert(!pairs.exists(p => p._1 === 4L || p._2 === 4L))
  }

  test("videoNearDupPairs: time-aligned frame hashes; brightness copy 3/3, partial edit 2/3, inverted 0/3") {
    import graft.ops.ImageCodec
    def frame(rowBits: Seq[Int], base: Int): java.awt.image.BufferedImage = {
      val bi = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (r <- 0 until 8) {
        var v = base
        bi.setRGB(0, r, (v << 16) | (v << 8) | v)
        for (c <- 0 until 7) {
          v += (if (((rowBits(r) >> c) & 1) == 1) 10 else -10)
          bi.setRGB(c + 1, r, (v << 16) | (v << 8) | v)
        }
      }
      bi
    }
    def gif(ps: Seq[Seq[Int]], base: Int): Array[Byte] =
      ImageCodec.writeGifAnimationImages(ps.map(frame(_, base)))
    val p = Seq(0x55, 0x2A, 0x55, 0x2A, 0x55, 0x2A, 0x55, 0x2A)
    val q = Seq.fill(8)(0x33)
    val r = Seq.fill(8)(0x0F)
    val q2 = Seq(0x32, 0x33, 0x32) ++ Seq.fill(5)(0x33) // 2 bits off q
    val t = Seq.fill(8)(0x11)
    // per-frame hashes are the rowBits patterns verbatim (closed form)
    val fh = ImageCodec.frameDHashes(gif(Seq(p, q), 100))
    assert(fh === Seq((0, 24019198012642645L), (1, 28936514141215155L)))
    val media = Seq(
      (1L, gif(Seq(p, q, r), 100)),
      (2L, gif(Seq(p, q, r), 140)),  // brightness shift: every frame matches
      (3L, gif(Seq(p, q2, t), 100)), // frame 0 exact, 1 at dist 2, 2 distinct
      (4L, gif(Seq(p.map(_ ^ 0x7f), q.map(_ ^ 0x7f), r.map(_ ^ 0x7f)), 100)),
      (5L, "not a video".getBytes)
    ).toDF("media_id", "content")
    val pairs = MultimodalOps.videoNearDupPairs(media, maxDist = 3, minMatchFrac = 0.5)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L, 3L, 3L), (1L, 3L, 2L, 3L), (2L, 3L, 2L, 3L)))
    // raising the bar to a full match keeps only the brightness copy
    val strict = MultimodalOps.videoNearDupPairs(media, maxDist = 3, minMatchFrac = 1.0)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(strict === Set((1L, 2L, 3L, 3L)))
    // stride sampling keeps positions 0 and 2: the edit clip matches only
    // at position 0 now (1 of 2 — inside a 0.5 bar, outside a full match)
    val strided = MultimodalOps.videoNearDupPairs(media, maxDist = 3, stride = 2,
        minMatchFrac = 0.5)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(strided === Set((1L, 2L, 2L, 2L), (1L, 3L, 1L, 2L), (2L, 3L, 1L, 2L)))
  }

  // window amplitudes walk ±`step` from `base` by the 32-bit delta pattern;
  // 8 constant frames per window, mono 16-bit → fingerprint == pattern.
  private def patternWav(pattern: Long, base: Int = 2000, step: Int = 400,
      div: Int = 1): Array[Byte] = {
    val v = new Array[Int](33)
    v(0) = base
    for (k <- 0 until 32)
      v(k + 1) = v(k) + (if (((pattern >> k) & 1L) == 1L) step else -step)
    graft.ops.WavCodec.write(v.flatMap(x => Array.fill(8)(x / div)), 1, 8000, 16)
  }

  test("WavCodec.fingerprint: closed-form delta hash, exact gain invariance, refusals") {
    import graft.ops.WavCodec
    // base 14000 keeps the worst-case ±400×32 walk strictly positive (the
    // hash reads |amplitude|, so a zero-crossing walk would fold deltas)
    val p = 0x5A5A1234L
    assert(WavCodec.fingerprint(patternWav(p, base = 14000)) === Some(p))
    // volume is a NO-OP on the fingerprint: half and quarter amplitude
    // (base and step divisible by 4 ⇒ integer scaling is exact)
    assert(WavCodec.fingerprint(patternWav(p, base = 14000, div = 2)) === Some(p))
    assert(WavCodec.fingerprint(patternWav(p, base = 14000, div = 4)) === Some(p))
    // fewer frames than windows → refuse (some windows would be empty)
    val short = WavCodec.write(Array.fill(20)(100), 1, 8000, 16)
    assert(WavCodec.fingerprint(short) === None)
    // non-WAV payloads refuse like the rest of the codec
    assert(WavCodec.fingerprint("not a wav".getBytes) === None)
  }

  test("audioNearDupPairs: volume-scaled copy at distance 0, edits within band, different material never pairs") {
    val pA = 0x55555555L
    val pC = pA | (1L << 3) | (1L << 17) // two flipped deltas
    val pD = ~pA & 0xffffffffL           // every delta inverted
    val media = Seq(
      (1L, patternWav(pA)),
      (2L, patternWav(pA, div = 2)),      // half volume
      (3L, patternWav(pC)),
      (4L, patternWav(pD)),
      (5L, "not audio".getBytes)          // non-WAV: dropped
    ).toDF("media_id", "content")
    val pairs = MultimodalOps.audioNearDupPairs(media, maxDist = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs === Set((1L, 2L, 0), (1L, 3L, 2), (2L, 3L, 2)))
    assert(!pairs.exists(p => p._1 === 4L || p._2 === 4L))
  }
}
