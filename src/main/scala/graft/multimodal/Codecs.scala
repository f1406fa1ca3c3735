package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import javax.imageio.{IIOImage, ImageIO}

/** REAL media decoders — no third-party codec library needed:
  *
  *  - RIFF/WAV PCM16 audio and PPM (P6) images via pure byte parsing;
  *  - PNG/JPEG/GIF/BMP via `javax.imageio.ImageIO`, which every JDK
  *    ships (including this container's) — compressed *images* are
  *    therefore decoded for real, not stubbed;
  *  - animated GIF as the multi-frame (video-analog) format, via the
  *    ImageIO reader's frame index.
  *
  * Only compressed AUDIO/VIDEO codecs (MP3/OGG/H.264) genuinely lack a
  * JDK decoder and stay behind the quarantined fallback in
  * [[Multimodal]]. Encoders exist for test/synthetic-data generation;
  * all directions round-trip (`CodecsSpec`). */
object Codecs {

  // ---- WAV (RIFF, PCM 16-bit little-endian) ----

  final case class WavInfo(sampleRate: Int, channels: Int,
      bitsPerSample: Int, nSamples: Int, durationMs: Double,
      rms: Double, peak: Int)

  /** Parse a RIFF/WAVE file with a PCM16 fmt chunk; walks the chunk
    * list (fmt may not be first), computes amplitude stats over the
    * data chunk. None on anything that isn't PCM16 WAV. */
  def decodeWavPcm16(bytes: Array[Byte]): Option[WavInfo] = {
    if (bytes.length < 44) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (bb.getInt(0) != 0x46464952 /* RIFF */ ||
        bb.getInt(8) != 0x45564157 /* WAVE */) return None
    var pos = 12
    var sampleRate = 0; var channels = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (pos + 8 <= bytes.length) {
      val id = bb.getInt(pos)
      val len = bb.getInt(pos + 4)
      // Hostile/corrupt RIFF: a negative or absurd chunk length must not
      // stall the walk (len = -8 would leave pos unchanged — an infinite
      // loop pinned to an executor core on arbitrary binaryFile input).
      if (len < 0 || len > bytes.length - pos - 8 + 1) return None
      if (id == 0x20746d66 /* fmt */ && pos + 8 + 16 <= bytes.length) {
        val audioFormat = bb.getShort(pos + 8)
        channels = bb.getShort(pos + 10)
        sampleRate = bb.getInt(pos + 12)
        bits = bb.getShort(pos + 22)
        if (audioFormat != 1) return None // not PCM
      } else if (id == 0x61746164 /* data */) {
        dataOff = pos + 8; dataLen = math.min(len, bytes.length - dataOff)
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (sampleRate <= 0 || bits != 16 || dataOff < 0 || channels <= 0)
      return None
    val n = dataLen / 2
    var sumSq = 0.0; var peak = 0; var i = 0
    while (i < n) {
      val s = bb.getShort(dataOff + 2 * i).toInt
      sumSq += s.toDouble * s
      if (math.abs(s) > peak) peak = math.abs(s)
      i += 1
    }
    val frames = n / channels
    Some(WavInfo(sampleRate, channels, bits, n,
      frames * 1000.0 / sampleRate,
      if (n > 0) math.sqrt(sumSq / n) else 0.0, peak))
  }

  /** Minimal PCM16 mono WAV writer (tests / synthetic corpora). */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0x46464952).putInt(36 + dataLen).putInt(0x45564157)
    bb.putInt(0x20746d66).putInt(16).putShort(1).putShort(1)
      .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
    bb.putInt(0x61746164).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  // ---- PPM (P6 binary RGB) ----

  final case class PpmInfo(width: Int, height: Int, maxVal: Int,
      meanLuma: Double)

  /** Parse a binary P6 PPM: header tokens (with comment support), then
    * raw RGB triples; mean luma = mean of 0.299R+0.587G+0.114B. */
  def decodePpm(bytes: Array[Byte]): Option[PpmInfo] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var pos = 2
    def skipWs(): Unit = {
      var done = false
      while (!done && pos < bytes.length) {
        val c = bytes(pos).toChar
        if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else if (c.isWhitespace) pos += 1
        else done = true
      }
    }
    def token(): Option[Int] = {
      skipWs()
      val start = pos
      while (pos < bytes.length && !bytes(pos).toChar.isWhitespace) pos += 1
      val s = new String(bytes, start, pos - start)
      try Some(s.toInt) catch { case _: NumberFormatException => None }
    }
    val parsed = for (w <- token(); h <- token(); m <- token()) yield (w, h, m)
    parsed match {
      case Some((w, h, m)) if w > 0 && h > 0 && m > 0 =>
        pos += 1 // single whitespace after maxval
        val need = w * h * 3
        if (bytes.length - pos < need) return None
        var sum = 0.0; var i = 0
        while (i < need) {
          val r = bytes(pos + i) & 0xFF
          val g = bytes(pos + i + 1) & 0xFF
          val b = bytes(pos + i + 2) & 0xFF
          sum += 0.299 * r + 0.587 * g + 0.114 * b
          i += 3
        }
        Some(PpmInfo(w, h, m, sum / (w * h)))
      case _ => None
    }
  }

  /** Minimal P6 writer (tests / synthetic corpora). */
  def encodePpm(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb length must be w*h*3")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    header ++ rgb
  }

  // ---- ImageIO (PNG/JPEG/GIF/BMP — JDK-standard codecs) ----

  /** Exact integer pixel statistics: sums are over 8-bit channel
    * values, the luma histogram buckets integer luma
    * `(299R + 587G + 114B) / 1000` (0..255) into `lumaHist.length`
    * equal ranges. All-integer so the stats hash bit-identically
    * across engines for lossless formats. */
  final case class PixelStats(width: Int, height: Int,
      sumR: Long, sumG: Long, sumB: Long, lumaHist: Array[Long]) {
    def nPixels: Long = width.toLong * height
    def meanLuma: Double =
      (0.299 * sumR + 0.587 * sumG + 0.114 * sumB) / nPixels
  }

  private def pixelStats(img: BufferedImage, nBuckets: Int): PixelStats = {
    val w = img.getWidth; val h = img.getHeight
    val hist = new Array[Long](nBuckets)
    var sr = 0L; var sg = 0L; var sb = 0L
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val p = row(x)
        val r = (p >> 16) & 0xFF; val g = (p >> 8) & 0xFF; val b = p & 0xFF
        sr += r; sg += g; sb += b
        hist((299 * r + 587 * g + 114 * b) / 1000 * nBuckets / 256) += 1
        x += 1
      }
      y += 1
    }
    PixelStats(w, h, sr, sg, sb, hist)
  }

  /** REAL compressed-image decode via the JDK's ImageIO (PNG/JPEG/GIF/
    * BMP/WBMP). None for payloads no installed reader accepts. For
    * lossless formats (PNG/BMP/GIF) the decoded pixels — and therefore
    * the integer stats — are byte-exact, which is what lets
    * `q_multimodal_features` carry a full cross-engine oracle. */
  def decodeImage(bytes: Array[Byte], nBuckets: Int = 8): Option[PixelStats] =
    try {
      Option(ImageIO.read(new ByteArrayInputStream(bytes)))
        .map(pixelStats(_, nBuckets))
    } catch { case _: Exception => None }

  /** PNG writer over packed RGB triples (tests / synthetic corpora);
    * lossless, so decode(encode(rgb)) returns the exact input pixels. */
  def encodePng(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb length must be w*h*3")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < width * height) {
      img.setRGB(i % width, i / width,
        ((rgb(3 * i) & 0xFF) << 16) | ((rgb(3 * i + 1) & 0xFF) << 8) |
          (rgb(3 * i + 2) & 0xFF))
      i += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL resize: decode (any ImageIO format), nearest-neighbor sample
    * to the target geometry — pure integer index arithmetic, fully
    * deterministic — re-encode as PNG. None if the payload doesn't
    * decode or the target is empty. */
  def resizeImageNearest(bytes: Array[Byte], targetW: Int,
      targetH: Int): Option[Array[Byte]] = {
    if (targetW <= 0 || targetH <= 0) return None
    try {
      Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        val out = new Array[Byte](targetW * targetH * 3)
        var i = 0
        while (i < targetW * targetH) {
          val sx = (i % targetW).toLong * w / targetW
          val sy = (i / targetW).toLong * h / targetH
          val p = img.getRGB(sx.toInt, sy.toInt)
          out(3 * i) = ((p >> 16) & 0xFF).toByte
          out(3 * i + 1) = ((p >> 8) & 0xFF).toByte
          out(3 * i + 2) = (p & 0xFF).toByte
          i += 1
        }
        encodePng(targetW, targetH, out)
      }
    } catch { case _: Exception => None }
  }

  /** REAL frame decode for multi-frame payloads (animated GIF — the
    * JDK-decodable video analog): per-frame pixel stats via the
    * ImageIO reader's frame index. A single-frame image yields one
    * entry; Nil if nothing decodes. */
  def decodeFrames(bytes: Array[Byte], nBuckets: Int = 8): Seq[PixelStats] = {
    val iis =
      try ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (iis == null) return Nil
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return Nil
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        (0 until n).flatMap { i =>
          try Some(pixelStats(reader.read(i), nBuckets))
          catch { case _: Exception => None }
        }
      } finally reader.dispose()
    } catch { case _: Exception => Nil }
    finally iis.close()
  }

  /** Animated-GIF writer (tests / synthetic corpora): one frame per
    * (rgb) payload, all frames the same geometry. GIF is palettized so
    * pixel values may quantize — tests assert geometry/frame counts,
    * not exact pixels. */
  def encodeGif(width: Int, height: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    val bos = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { rgb =>
        require(rgb.length == width * height * 3, "rgb length must be w*h*3")
        val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
        var i = 0
        while (i < width * height) {
          img.setRGB(i % width, i / width,
            ((rgb(3 * i) & 0xFF) << 16) | ((rgb(3 * i + 1) & 0xFF) << 8) |
              (rgb(3 * i + 2) & 0xFF))
          i += 1
        }
        writer.writeToSequence(new IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose(); ios.close()
    }
    bos.toByteArray
  }
}
