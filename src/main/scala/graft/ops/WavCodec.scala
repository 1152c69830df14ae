package graft.ops

/** Parsed RIFF/WAVE format header (no sample decode). */
final case class WavMeta(
    channels: Int, sampleRate: Int, bitsPerSample: Int, nFrames: Long)

/** Full PCM decode result: exact integer/double statistics over the decoded
  * samples (8-bit samples are centered at 128, so amplitudes are comparable
  * across bit depths), plus a 16-bin amplitude histogram (L1-normalized) —
  * the fixed-shape feature a training pipeline feeds downstream. */
final case class DecodedAudio(
    meta: WavMeta, durationMs: Double, meanAbs: Double, rms: Double,
    peak: Int, zeroCrossings: Long, ampHist: Array[Float])

/**
 * Pure-JVM audio codec (X5's audio decode kernel, de-stubbed): the RIFF/WAVE
 * container is hand-parsed (chunk walk → `fmt ` + `data`), and PCM samples
 * (8-bit unsigned / 16-bit signed little-endian, any channel count) decode
 * with plain integer arithmetic — no native libraries, no
 * `javax.sound.sampled` service discovery, so this runs identically in any
 * executor container.
 *
 * Statistics are exact: mean absolute amplitude and RMS over all interleaved
 * samples, peak |amplitude|, and the zero-crossing count of channel 0 (the
 * classic voice-activity / pitch proxy). Compressed WAVE encodings
 * (audioFormat ≠ 1 PCM) and other bit depths return None — they are not
 * silently misdecoded.
 */
object WavCodec {

  /** Parse the container header only. None for non-WAV / non-PCM payloads. */
  def probe(bytes: Array[Byte]): Option[WavMeta] = parseChunks(bytes).map(_._1)

  private def parseChunks(bytes: Array[Byte]): Option[(WavMeta, Int, Int)] = {
    if (bytes == null || bytes.length < 44) return None
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def tag(i: Int): String = new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var pos = 12
    var fmt: Option[(Int, Int, Int, Int, Int)] = None // format, ch, rate, align, bits
    var data: Option[(Int, Int)] = None // offset, size
    while (pos + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(pos)
      val size = le32(pos + 4)
      // long arithmetic: a hostile 32-bit size must refuse, not overflow
      // into a negative sum that slips past the bounds check and crashes
      if (size < 0 || pos.toLong + 8L + size > bytes.length) return None
      id match {
        case "fmt " if size >= 16 =>
          fmt = Some((le16(pos + 8), le16(pos + 10), le32(pos + 12),
            le16(pos + 20), le16(pos + 22)))
        case "data" => data = Some((pos + 8, size))
        case _ => ()
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    for {
      (audioFormat, ch, rate, align, bits) <- fmt
      (off, sz) <- data
      // PCM only, 8/16-bit only, and a coherent block alignment — anything
      // else would misdecode, so refuse instead
      if audioFormat == 1 && (bits == 8 || bits == 16) && ch > 0 && rate > 0 &&
        align == ch * (bits / 8)
    } yield (WavMeta(ch, rate, bits, sz.toLong / align), off, sz)
  }

  /** Full PCM decode. None when the payload is not a PCM WAV. */
  def decode(bytes: Array[Byte]): Option[DecodedAudio] = parseChunks(bytes).map {
    case (meta, off, sz) =>
      val bytesPer = meta.bitsPerSample / 8
      val nSamples = sz / bytesPer
      var sumAbs = 0L
      var sumSq = 0L
      var peak = 0
      val hist = new Array[Long](16)
      // sample s (interleaved): channel = s % channels; frame = s / channels
      var prevSign = 0 // channel-0 sign memory: -1 / +1 (0 = none yet)
      var crossings = 0L
      var s = 0
      while (s < nSamples) {
        val v =
          if (bytesPer == 1) (bytes(off + s) & 0xff) - 128
          else {
            val i = off + s * 2
            ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toInt
          }
        val a = math.abs(v)
        sumAbs += a
        sumSq += v.toLong * v
        if (a > peak) peak = a
        // 16-bin histogram over the full signed range of the bit depth
        val bin = if (bytesPer == 1) (v + 128) >> 4 else (v + 32768) >> 12
        hist(bin) += 1
        if (s % meta.channels == 0) { // channel 0 only
          val sign = if (v < 0) -1 else 1
          if (prevSign != 0 && sign != prevSign) crossings += 1
          prevSign = sign
        }
        s += 1
      }
      val histF = new Array[Float](16)
      var i = 0
      while (i < 16) {
        histF(i) = if (nSamples == 0) 0f else (hist(i).toDouble / nSamples).toFloat
        i += 1
      }
      DecodedAudio(meta,
        durationMs = meta.nFrames * 1000.0 / meta.sampleRate,
        meanAbs = if (nSamples == 0) 0.0 else sumAbs.toDouble / nSamples,
        rms = if (nSamples == 0) 0.0 else math.sqrt(sumSq.toDouble / nSamples),
        peak = peak, zeroCrossings = crossings, ampHist = histF)
  }

  /** 32-bit acoustic fingerprint (the audio twin of [[ImageCodec.dHash]]):
    * channel 0 is sliced into 33 equal time windows, each window's mean
    * absolute amplitude is its energy, and bit k (k = 0..31) is set iff
    * energy(k+1) > energy(k) — the classic energy-DELTA hash. Comparing
    * CONSECUTIVE windows (not window vs global mean) makes the fingerprint
    * exactly invariant under volume scaling (a positive gain preserves every
    * strict energy ordering), so the same clip at a different level lands at
    * Hamming distance 0, while localized edits flip only the deltas they
    * touch. Fewer frames than windows cannot fingerprint (some windows would
    * be empty) → None, like every other refusal in this codec. */
  def fingerprint(bytes: Array[Byte], windows: Int = 33): Option[Long] = {
    require(windows >= 2 && windows <= 65, s"windows must be in [2, 65], got $windows")
    parseChunks(bytes).flatMap { case (meta, off, _) =>
      val n = meta.nFrames
      if (n < windows) None
      else {
        val bytesPer = meta.bitsPerSample / 8
        val frameBytes = meta.channels * bytesPer
        val sumAbs = new Array[Long](windows)
        val cnt = new Array[Long](windows)
        var f = 0L
        while (f < n) {
          val i = off + (f * frameBytes).toInt // channel 0 of frame f
          val v =
            if (bytesPer == 1) (bytes(i) & 0xff) - 128
            else ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toInt
          val w = (f * windows / n).toInt
          sumAbs(w) += math.abs(v)
          cnt(w) += 1
          f += 1
        }
        // exact mean-energy compare via 128-bit cross-multiply: sumAbs can
        // reach ~2^43 on a max-amplitude 2 GB payload, so the 64-bit product
        // would overflow; Math.multiplyHigh keeps the compare exact
        def crossGt(a: Long, b: Long, c: Long, d: Long): Boolean = { // a*b > c*d
          val (hi1, lo1) = (Math.multiplyHigh(a, b), a * b)
          val (hi2, lo2) = (Math.multiplyHigh(c, d), c * d)
          hi1 != hi2 && hi1 > hi2 ||
            hi1 == hi2 && java.lang.Long.compareUnsigned(lo1, lo2) > 0
        }
        var h = 0L
        var k = 0
        while (k < windows - 1) {
          if (crossGt(sumAbs(k + 1), cnt(k), sumAbs(k), cnt(k + 1))) h |= 1L << k
          k += 1
        }
        Some(h)
      }
    }
  }

  /** Serialize PCM samples as a canonical WAV byte stream (fixture builder —
    * the writer twin of [[decode]], used by specs and the oracle query).
    * 16-bit signed when `bits == 16` (values clamped to short range), 8-bit
    * unsigned when `bits == 8` (values are CENTERED amplitudes, stored +128).
    * `samples` are interleaved frames. */
  def write(samples: Array[Int], channels: Int, sampleRate: Int, bits: Int): Array[Byte] = {
    require(bits == 8 || bits == 16, s"unsupported bit depth $bits")
    require(samples.length % channels == 0, "partial frame")
    val bytesPer = bits / 8
    val dataSize = samples.length * bytesPer
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * bytesPer) // byte rate
      .putShort((channels * bytesPer).toShort) // block align
      .putShort(bits.toShort)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach { v =>
      // both depths SATURATE out-of-range input (unclamped 8-bit would wrap
      // (v + 128).toByte into a different amplitude silently)
      if (bytesPer == 1) buf.put((math.max(-128, math.min(127, v)) + 128).toByte)
      else buf.putShort(math.max(Short.MinValue, math.min(Short.MaxValue, v)).toShort)
    }
    buf.array()
  }
}
