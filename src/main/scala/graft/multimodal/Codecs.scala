package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL decoders for uncompressed media containers — pure byte parsing,
  * no codec library needed, so unlike [[Multimodal.decodeStub]] these
  * run for real in this container: RIFF/WAV PCM16 audio and PPM (P6)
  * images. Compressed formats (JPEG/MP3/H.264) stay behind the stub —
  * swapping in a codec library touches nothing but the decode fn.
  *
  * Encoders exist for test/synthetic-data generation; both directions
  * round-trip (`CodecsSpec`). */
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
}
