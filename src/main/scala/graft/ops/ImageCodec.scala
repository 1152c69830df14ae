package graft.ops

/** Parsed image header (no pixel decode): real container metadata. */
final case class ImageMeta(format: String, width: Int, height: Int, channels: Int)

/** Full pixel decode result: real per-pixel statistics + an 8×8 grayscale
  * thumbnail (the perceptual-hash precursor layout). */
final case class DecodedImage(
    meta: ImageMeta, meanLuma: Double, channelMeans: Array[Double],
    lumaHist: Array[Float], thumb: Array[Float])

/** One decoded frame of a multi-frame container (animated GIF): the
  * video-frame-sampling unit. */
final case class FrameStats(frameIdx: Int, width: Int, height: Int, meanLuma: Double)

/**
 * Pure-JVM image codec (X5's decode kernel, de-stubbed): header PROBING is
 * hand-parsed from the real container formats (PNG IHDR, JPEG SOF marker
 * walk, GIF logical screen descriptor, BMP info header) — cheap per-row
 * metadata with zero pixel work — and full pixel DECODE rides the JDK's
 * built-in `javax.imageio` readers (PNG/JPEG/GIF/BMP ship with the JDK; no
 * native libraries involved, so this runs in any executor container).
 *
 * All statistics are exact integer/double arithmetic over the decoded ARGB
 * pixels: mean luminance (ITU-R BT.601 integer weights), per-channel means,
 * a 16-bin luminance histogram (L1-normalized), and an 8×8 area-averaged
 * grayscale thumbnail — the fixed-shape feature a training pipeline feeds
 * downstream.
 */
object ImageCodec {

  /** Parse the container header only. Returns None for non-image payloads. */
  def probe(bytes: Array[Byte]): Option[ImageMeta] = {
    if (bytes == null || bytes.length < 16) return None
    def u8(i: Int): Int = bytes(i) & 0xff
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    // PNG: 8-byte signature, then the IHDR chunk is mandatory-first:
    // length(4) "IHDR" width(4) height(4) bitdepth(1) colortype(1)
    if (u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
        bytes.length >= 26 && bytes(12) == 'I' && bytes(13) == 'H' &&
        bytes(14) == 'D' && bytes(15) == 'R') {
      val colorType = u8(25)
      val channels = colorType match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4; case _ => 3
      }
      return Some(ImageMeta("png", be32(16), be32(20), channels))
    }
    // JPEG: SOI then marker segments; dimensions live in the first SOF0-SOF15
    // frame header (skipping DHT/DAC/RST/standalone markers).
    if (u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 9 < bytes.length) {
        if (u8(i) != 0xff) return None // marker desync: not a well-formed JPEG
        val m = u8(i + 1)
        if (m == 0xff) { i += 1 } // fill bytes before a marker are legal
        else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) { i += 2 }
        else {
          val segLen = be16(i + 2)
          if (segLen < 2) return None
          val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            // SOF payload: precision(1) height(2) width(2) nComponents(1)
            return Some(ImageMeta("jpeg", be16(i + 7), be16(i + 5), u8(i + 9)))
          }
          i += 2 + segLen
        }
      }
      return None
    }
    // GIF87a / GIF89a: logical screen width/height, little-endian at offset 6
    if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8' &&
        (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a')
      return Some(ImageMeta("gif", le16(6), le16(8), 1))
    // BMP: "BM", BITMAPINFOHEADER width/height (LE) at offsets 18/22; height
    // may be negative (top-down rows)
    if (bytes(0) == 'B' && bytes(1) == 'M' && bytes.length >= 30)
      return Some(ImageMeta("bmp", le32(18), math.abs(le32(22)),
        math.max(1, le16(28) / 8)))
    None
  }

  /** Full pixel decode via the JDK's ImageIO readers. None when the payload
    * is not a decodable image. */
  def decode(bytes: Array[Byte]): Option[DecodedImage] = probe(bytes).flatMap { meta =>
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val (w, h, meanLuma, chans, histF, thumb) = pixelStats(img)
      Some(DecodedImage(meta.copy(width = w, height = h), meanLuma, chans, histF, thumb))
    }
  }

  /** Shared per-frame reader loop: decode every frame the reader can
    * produce and fold it through `f`. Frames whose pixels the reader cannot
    * produce are skipped (truncated trailers). */
  private def readFrames[T](bytes: Array[Byte],
      f: (Int, java.awt.image.BufferedImage) => T): Seq[T] = probe(bytes) match {
    case None => Seq.empty
    case Some(_) =>
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) Seq.empty
        else {
          val reader = readers.next()
          // dispose in finally: only Exception is caught per-frame, and an
          // Error/unexpected throwable mid-loop must not leak the reader's
          // native/heap resources (the iis has its own finally below)
          try {
            reader.setInput(iis)
            val n = try reader.getNumImages(true) catch { case _: Exception => 1 }
            val out = Seq.newBuilder[T]
            var i = 0
            while (i < math.max(1, n)) {
              val img = try reader.read(i) catch { case _: Exception => null }
              if (img != null) out += f(i, img)
              i += 1
            }
            out.result()
          } finally reader.dispose()
        }
      } finally iis.close()
  }

  /** Per-frame decode of a MULTI-frame container (animated GIF — the one
    * video-like format with a pure-JVM codec). Each frame is fully pixel-
    * decoded; single-frame formats yield one entry. */
  def frames(bytes: Array[Byte]): Seq[FrameStats] = readFrames(bytes, {
    (i, img) =>
      val (w, h, meanLuma, _, _, _) = pixelStats(img)
      FrameStats(i, w, h, meanLuma)
  })

  /** Per-frame perceptual hash: (frameIdx, 56-bit [[dHash]] of the frame's
    * 8×8 area-average thumbnail) — the video-dedup kernel (each frame gets
    * the same hash its still-image twin would). */
  def frameDHashes(bytes: Array[Byte]): Seq[(Int, Long)] = readFrames(bytes, {
    (i, img) =>
      val (_, _, _, _, _, thumb) = pixelStats(img)
      (i, dHash(thumb))
  })

  /** Serialize constant-color frames as an ANIMATED GIF via the JDK's GIF
    * writer (fixture builder — the writer twin of [[frames]], used by specs
    * and the oracle query; single solid colors survive palettization
    * exactly). */
  def writeGifAnimation(w: Int, h: Int, frameColors: Seq[Int]): Array[Byte] =
    writeGifAnimationImages(frameColors.map { rgb =>
      val bi = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) bi.setRGB(x, y, rgb)
      bi
    })

  /** General form: arbitrary frames as an animated GIF. Any frame with
    * ≤ 256 distinct colors (every fixture gradient) survives palettization
    * bit-exactly. */
  def writeGifAnimationImages(images: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      images.foreach { bi =>
        writer.writeToSequence(new javax.imageio.IIOImage(bi, null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** 56-bit difference hash (dHash) over the 8×8 thumbnail: bit `r*7+c` is
    * set iff cell (r,c) is strictly darker than its right neighbor — 8 rows
    * × 7 adjacent-column comparisons. Gradient DIRECTIONS, not magnitudes:
    * a uniform brightness shift or a lossless re-encode leaves every bit
    * unchanged, which is exactly the invariance image near-dup needs. The
    * thumbnail is the exact area-average [[decode]] already emits, so for
    * 8×8 grayscale fixtures the hash is closed-form (cell = pixel luma). */
  def dHash(thumb: Array[Float]): Long = {
    require(thumb.length == 64, s"dHash needs the 8x8 thumbnail, got ${thumb.length}")
    var h = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 7) {
        if (thumb(r * 8 + c) < thumb(r * 8 + c + 1)) h |= 1L << (r * 7 + c)
        c += 1
      }
      r += 1
    }
    h
  }

  /** Exact pixel statistics of one decoded frame: (width, height, BT.601
    * mean luma, per-channel means, 16-bin luma histogram, 8×8 thumbnail). */
  private def pixelStats(img: java.awt.image.BufferedImage)
      : (Int, Int, Double, Array[Double], Array[Float], Array[Float]) = {
      val w = img.getWidth
      val h = img.getHeight
      val n = w.toLong * h
      var sumR = 0L; var sumG = 0L; var sumB = 0L; var sumY = 0L
      val hist = new Array[Long](16)
      // 8×8 area-average thumbnail accumulators
      val tSum = new Array[Double](64)
      val tCnt = new Array[Long](64)
      var y = 0
      while (y < h) {
        val ty = math.min(7, y * 8 / h)
        var x = 0
        while (x < w) {
          val argb = img.getRGB(x, y)
          val r = (argb >> 16) & 0xff
          val g = (argb >> 8) & 0xff
          val b = argb & 0xff
          // BT.601 integer luma: (77 R + 150 G + 29 B) >> 8
          val luma = (77 * r + 150 * g + 29 * b) >> 8
          sumR += r; sumG += g; sumB += b; sumY += luma
          hist(luma >> 4) += 1
          val ti = ty * 8 + math.min(7, x * 8 / w)
          tSum(ti) += luma; tCnt(ti) += 1
          x += 1
        }
        y += 1
      }
      val histF = new Array[Float](16)
      var i = 0
      while (i < 16) { histF(i) = if (n == 0) 0f else (hist(i).toDouble / n).toFloat; i += 1 }
      val thumb = new Array[Float](64)
      i = 0
      while (i < 64) { thumb(i) = if (tCnt(i) == 0) 0f else (tSum(i) / tCnt(i)).toFloat; i += 1 }
      (w, h,
        if (n == 0) 0.0 else sumY.toDouble / n,
        Array(
          if (n == 0) 0.0 else sumR.toDouble / n,
          if (n == 0) 0.0 else sumG.toDouble / n,
          if (n == 0) 0.0 else sumB.toDouble / n),
        histF, thumb)
  }
}
