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

  // ---- compressed-audio CONTAINER metadata (MP3/ID3, Ogg) ----
  //
  // The JDK ships no MP3/Vorbis/Opus decoder, so sample DECODE for
  // these formats is out of scope (quarantined fallback in
  // [[Multimodal]]) — but the container structure is plain bytes and
  // parses for real: ID3v2 text frames + MPEG frame headers for MP3,
  // page walk + codec id headers for Ogg.

  final case class AudioMeta(format: String, sampleRate: Int,
      channels: Int, bitrateKbps: Int, durationMs: Double,
      title: Option[String], artist: Option[String])

  private def syncsafe(bytes: Array[Byte], off: Int): Int =
    ((bytes(off) & 0x7F) << 21) | ((bytes(off + 1) & 0x7F) << 14) |
      ((bytes(off + 2) & 0x7F) << 7) | (bytes(off + 3) & 0x7F)

  private def id3Text(payload: Array[Byte]): Option[String] = {
    if (payload.isEmpty) return None
    val s = payload(0) match {
      case 0 => new String(payload, 1, payload.length - 1, "ISO-8859-1")
      case 1 => new String(payload, 1, payload.length - 1, "UTF-16")
      case 2 => new String(payload, 1, payload.length - 1, "UTF-16BE")
      case 3 => new String(payload, 1, payload.length - 1, "UTF-8")
      case _ => return None
    }
    Some(s.takeWhile(_ != '\u0000')).filter(_.nonEmpty)
  }

  /** Parse an ID3v2.3/2.4 tag: returns (tagEnd offset, title, artist).
    * (0, None, None) when no tag is present — that is legal MP3. */
  def parseId3v2(bytes: Array[Byte]): (Int, Option[String], Option[String]) = {
    if (bytes.length < 10 || bytes(0) != 'I' || bytes(1) != 'D' || bytes(2) != '3')
      return (0, None, None)
    val major = bytes(3) & 0xFF
    val tagSize = syncsafe(bytes, 6)
    val end = math.min(10 + tagSize, bytes.length)
    var pos = 10
    var title: Option[String] = None; var artist: Option[String] = None
    while (pos + 10 <= end) {
      val id = new String(bytes, pos, 4, "ISO-8859-1")
      val rawSize =
        if (major >= 4) syncsafe(bytes, pos + 4)
        else ((bytes(pos + 4) & 0xFF) << 24) | ((bytes(pos + 5) & 0xFF) << 16) |
          ((bytes(pos + 6) & 0xFF) << 8) | (bytes(pos + 7) & 0xFF)
      if (rawSize <= 0 || pos + 10 + rawSize > end) pos = end // padding/corrupt: stop
      else {
        val payload = bytes.slice(pos + 10, pos + 10 + rawSize)
        if (id == "TIT2") title = id3Text(payload)
        if (id == "TPE1") artist = id3Text(payload)
        pos += 10 + rawSize
      }
    }
    (end, title, artist)
  }

  // MPEG1 Layer III bitrate (kbps) and sample-rate tables
  private val Mp3Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
  private val Mp3Rates = Array(44100, 48000, 32000, 0)

  /** Parse MP3 container metadata: ID3v2 text frames plus the first
    * MPEG-1 Layer III frame header after the tag; duration is the CBR
    * estimate payload·8/bitrate. None if no valid frame sync found. */
  def parseMp3(bytes: Array[Byte]): Option[AudioMeta] = {
    // anchored container magic wins over the unanchored sync scan: an
    // Ogg page's granule/serial bytes can fake an MPEG sync (found by
    // the cross-engine oracle: granule -1 = FF… followed by a serial
    // whose low byte is FA/FB), and RIFF audio is WAV's to parse
    if (bytes.length >= 4 &&
        ((bytes(0) == 'O' && bytes(1) == 'g' && bytes(2) == 'g' && bytes(3) == 'S') ||
         (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F')))
      return None
    val (tagEnd, title, artist) = parseId3v2(bytes)
    var pos = tagEnd
    while (pos + 4 <= bytes.length) {
      val b1 = bytes(pos) & 0xFF; val b2 = bytes(pos + 1) & 0xFF
      // sync (11 bits) + MPEG1 (v=11) + Layer III (l=01)
      if (b1 == 0xFF && (b2 & 0xFE) == 0xFA) {
        val bitrate = Mp3Bitrates((bytes(pos + 2) & 0xF0) >> 4)
        val rate = Mp3Rates((bytes(pos + 2) & 0x0C) >> 2)
        val channels = if (((bytes(pos + 3) & 0xC0) >> 6) == 3) 1 else 2
        if (bitrate > 0 && rate > 0) {
          val payloadBytes = bytes.length - pos
          return Some(AudioMeta("mp3", rate, channels, bitrate,
            payloadBytes * 8.0 / bitrate, title, artist))
        }
      }
      pos += 1
    }
    None
  }

  /** Walk Ogg pages; identify Vorbis or Opus from the first packet's id
    * header; duration from the last granule position (Opus granules
    * run at 48 kHz by spec, Vorbis at the declared rate). */
  /** Parse a VorbisComment / OpusTags block at `off`: vendor string
    * then n `KEY=value` UTF-8 comments — extract TITLE and ARTIST
    * (case-insensitive keys per spec). Bounds-checked: a hostile
    * length field stops the scan, never overruns. */
  private def parseComments(bytes: Array[Byte], off: Int,
      end: Int): (Option[String], Option[String]) = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (off + 4 > end) return (None, None)
    val vendorLen = bb.getInt(off)
    if (vendorLen < 0 || off + 4 + vendorLen + 4 > end) return (None, None)
    var pos = off + 4 + vendorLen
    val n = bb.getInt(pos); pos += 4
    if (n < 0) return (None, None)
    var title: Option[String] = None; var artist: Option[String] = None
    var i = 0
    while (i < n && pos + 4 <= end) {
      val len = bb.getInt(pos); pos += 4
      if (len < 0 || pos + len > end) return (title, artist)
      val c = new String(bytes, pos, len, "UTF-8")
      val eq = c.indexOf('=')
      if (eq > 0) {
        val key = c.substring(0, eq).toUpperCase(java.util.Locale.ROOT)
        val v = Some(c.substring(eq + 1)).filter(_.nonEmpty)
        if (key == "TITLE") title = v
        if (key == "ARTIST") artist = v
      }
      pos += len; i += 1
    }
    (title, artist)
  }

  def parseOgg(bytes: Array[Byte]): Option[AudioMeta] = {
    var pos = 0
    var rate = 0; var channels = 0; var codec = ""
    var lastGranule = 0L; var preSkip = 0
    var title: Option[String] = None; var artist: Option[String] = None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var first = true
    while (pos + 27 <= bytes.length &&
        bytes(pos) == 'O' && bytes(pos + 1) == 'g' &&
        bytes(pos + 2) == 'g' && bytes(pos + 3) == 'S') {
      val granule = bb.getLong(pos + 6)
      if (granule >= 0) lastGranule = granule
      val nSegs = bytes(pos + 26) & 0xFF
      if (pos + 27 + nSegs > bytes.length) return None
      var bodyLen = 0
      (0 until nSegs).foreach(i => bodyLen += bytes(pos + 27 + i) & 0xFF)
      val body = pos + 27 + nSegs
      if (first && body + 19 <= bytes.length) {
        if (bytes(body) == 1 && new String(bytes, body + 1, 6, "ISO-8859-1") == "vorbis") {
          codec = "vorbis"
          channels = bytes(body + 11) & 0xFF
          rate = bb.getInt(body + 12)
        } else if (new String(bytes, body, 8, "ISO-8859-1") == "OpusHead") {
          codec = "opus"
          channels = bytes(body + 9) & 0xFF
          preSkip = bb.getShort(body + 10) & 0xFFFF
          rate = 48000 // granule clock; input rate at body+12 is advisory
        }
        first = false
      } else if (title.isEmpty && artist.isEmpty) {
        // metadata packet: type-3 vorbis comment header or OpusTags
        val bodyEnd = math.min(body + bodyLen, bytes.length)
        if (body + 7 <= bytes.length && bytes(body) == 3 &&
            new String(bytes, body + 1, 6, "ISO-8859-1") == "vorbis") {
          val (t, a) = parseComments(bytes, body + 7, bodyEnd)
          title = t; artist = a
        } else if (body + 8 <= bytes.length &&
            new String(bytes, body, 8, "ISO-8859-1") == "OpusTags") {
          val (t, a) = parseComments(bytes, body + 8, bodyEnd)
          title = t; artist = a
        }
      }
      pos = body + bodyLen // body > pos always: the walk cannot stall
    }
    if (codec.isEmpty || rate <= 0) None
    else Some(AudioMeta("ogg/" + codec, rate, channels, 0,
      math.max(0L, lastGranule - preSkip) * 1000.0 / rate, title, artist))
  }

  /** Container-level audio metadata for any supported format: WAV gets
    * the REAL decode stats, MP3/Ogg get real container parsing (decode
    * of the compressed samples stays out — no JDK codec). */
  def audioMeta(bytes: Array[Byte]): Option[AudioMeta] =
    decodeWavPcm16(bytes).map(w =>
        AudioMeta("wav", w.sampleRate, w.channels, w.sampleRate * w.bitsPerSample * w.channels / 1000,
          w.durationMs, None, None))
      .orElse(parseOgg(bytes)) // anchored magic before the MP3 sync scan
      .orElse(parseMp3(bytes))

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

  /** Difference hash (dHash) — the standard perceptual image
    * fingerprint for image-level dedup: decode (any ImageIO format),
    * nearest-neighbor sample a 9×8 grayscale grid (same integer index
    * arithmetic as [[resizeImageNearest]]: src = dstIdx·srcDim/dstDim),
    * then one bit per horizontally adjacent pair — bit j·8+i set iff
    * gray(i+1,j) > gray(i,j). 64 bits returned as two non-negative
    * 32-bit halves (lo = bits 0–31, hi = bits 32–63) so SQL engines can
    * rebuild the signature without signed-overflow hazards. Lossless
    * inputs make the hash integer-exact and cross-engine verifiable.
    * Returns None ONLY when the payload fails to decode. Images
    * narrower than the 9×8 grid are still hashed — the NN index
    * arithmetic is total (it just resamples the same source pixels),
    * so tiny images yield a (degenerate but deterministic) hash. */
  def dhash64(bytes: Array[Byte]): Option[(Long, Long)] =
    try {
      Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { img =>
        val w = img.getWidth; val h = img.getHeight
        val gray = Array.ofDim[Int](8, 9)
        var j = 0
        while (j < 8) {
          var i = 0
          while (i < 9) {
            val sx = (i.toLong * w / 9).toInt
            val sy = (j.toLong * h / 8).toInt
            val p = img.getRGB(sx, sy)
            gray(j)(i) = (299 * ((p >> 16) & 0xFF) + 587 * ((p >> 8) & 0xFF)
              + 114 * (p & 0xFF)) / 1000
            i += 1
          }
          j += 1
        }
        var lo = 0L; var hi = 0L
        j = 0
        while (j < 8) {
          var i = 0
          while (i < 8) {
            if (gray(j)(i + 1) > gray(j)(i)) {
              val bit = j * 8 + i
              if (bit < 32) lo |= 1L << bit else hi |= 1L << (bit - 32)
            }
            i += 1
          }
          j += 1
        }
        (hi, lo)
      }
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

  // ---- ISO-BMFF (MP4/MOV) container ----

  final case class VideoMeta(format: String, brand: String,
      timescale: Int, durationMs: Double, nTracks: Int,
      nVideoTracks: Int, width: Int, height: Int)

  /** ISO-BMFF box walk — the video-container analog of the MP3/Ogg
    * parsers (sample DECODE stays out: no JDK codec; the container
    * structure is plain big-endian bytes and parses for real).
    *
    * Walks top-level boxes for `ftyp` (major brand) and `moov`;
    * inside `moov`, `mvhd` v0/v1 (32- vs 64-bit creation/duration
    * fields shift the timescale offset) gives the presentation clock,
    * and each `trak` contributes its `mdia/hdlr` handler (vide/soun/…)
    * plus, for the FIRST video track, `tkhd`'s 16.16 fixed-point
    * width/height. Box sizes are unsigned; `size == 1` means a 64-bit
    * `largesize` follows (mdat commonly uses it) and `size == 0` means
    * to-end-of-file — both handled, both bounds-checked, and a
    * non-advancing box aborts the walk instead of spinning (the
    * negative-RIFF lesson). Returns Some only when both `ftyp` and a
    * sane `mvhd` were found. */
  def mp4Meta(bytes: Array[Byte]): Option[VideoMeta] = {
    val n = bytes.length
    def be32(off: Int): Long =
      ((bytes(off) & 0xFFL) << 24) | ((bytes(off + 1) & 0xFFL) << 16) |
        ((bytes(off + 2) & 0xFFL) << 8) | (bytes(off + 3) & 0xFFL)
    def be64(off: Int): Long = (be32(off) << 32) | be32(off + 4)
    def typ(off: Int): String = new String(bytes, off, 4, "ISO-8859-1")
    // (type, payloadStart, payloadEnd) for each box in [start, end)
    def boxes(start: Int, end: Int): List[(String, Int, Int)] = {
      val out = List.newBuilder[(String, Int, Int)]
      var off = start
      var guard = 0
      while (off + 8 <= end && guard < 4096) {
        guard += 1
        val size32 = be32(off)
        val t = typ(off + 4)
        val (payload, boxEnd) =
          if (size32 == 1L) {
            if (off + 16 > end) return out.result()
            val ls = be64(off + 8)
            if (ls < 16 || ls > (end - off).toLong) return out.result()
            (off + 16, off + ls.toInt)
          } else if (size32 == 0L) (off + 8, end) // to end of enclosing
          else {
            if (size32 < 8 || size32 > (end - off).toLong) return out.result()
            (off + 8, off + size32.toInt)
          }
        out += ((t, payload, boxEnd))
        if (boxEnd <= off) return out.result() // no forward progress
        off = boxEnd
      }
      out.result()
    }
    if (n < 16) return None
    val top = boxes(0, n)
    val brand = top.collectFirst { case ("ftyp", s, e) if s + 4 <= e =>
      typ(s) }
    val moov = top.collectFirst { case ("moov", s, e) => (s, e) }
    (brand, moov) match {
      case (Some(b), Some((ms, me))) =>
        val inMoov = boxes(ms, me)
        val mvhd = inMoov.collectFirst { case ("mvhd", s, e) =>
          val v = bytes(s) & 0xFF
          // v0: ver/flags(4) ctime(4) mtime(4) ts(4) dur(4)
          // v1: ver/flags(4) ctime(8) mtime(8) ts(4) dur(8)
          if (v == 1 && s + 32 <= e)
            Some((be32(s + 20).toInt, be64(s + 24)))
          else if (v == 0 && s + 20 <= e)
            Some((be32(s + 12).toInt, be32(s + 16)))
          else None
        }.flatten
        mvhd match {
          case Some((ts, dur)) if ts > 0 =>
            val traks = inMoov.collect { case ("trak", s, e) => (s, e) }
            var nVideo = 0; var w = 0; var h = 0
            traks.foreach { case (tks, tke) =>
              val inTrak = boxes(tks, tke)
              val handler = inTrak.collectFirst { case ("mdia", s, e) =>
                boxes(s, e).collectFirst { case ("hdlr", hs, he)
                    if hs + 12 <= he => typ(hs + 8) }
              }.flatten
              if (handler.contains("vide")) {
                nVideo += 1
                if (w == 0) inTrak.collectFirst { case ("tkhd", s, e) =>
                  val v = bytes(s) & 0xFF
                  // width/height are the LAST 8 payload bytes (16.16)
                  if (((v == 0 && e - s >= 84) || (v == 1 && e - s >= 96))
                      && e - 8 >= s) {
                    w = (be32(e - 8) >> 16).toInt
                    h = (be32(e - 4) >> 16).toInt
                  }
                }
              }
            }
            Some(VideoMeta("mp4", b, ts, dur * 1000.0 / ts,
              traks.length, nVideo, w, h))
          case _ => None
        }
      case _ => None
    }
  }
}
