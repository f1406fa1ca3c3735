package graft

import java.nio.{ByteBuffer, ByteOrder}

import graft.multimodal.{Codecs, Multimodal}

/** Compressed-audio CONTAINER parsing (the JDK has no MP3/Vorbis/Opus
  * decoder, so sample decode is out of scope — but ID3v2 frames, MPEG
  * frame headers, and Ogg page walks are plain bytes and parse for
  * real). Synthetic files are assembled byte-by-byte per spec. */
class AudioMetaSpec extends SparkSuite {

  /** ID3v2.3 tag with TIT2/TPE1 + one MPEG-1 Layer III header + filler. */
  private def synthMp3(title: String, artist: String,
      bitrateIdx: Int = 9 /*128k*/, payload: Int = 16000): Array[Byte] = {
    def frame(id: String, text: String): Array[Byte] = {
      val body = Array[Byte](0) ++ text.getBytes("ISO-8859-1")
      val bb = ByteBuffer.allocate(10 + body.length)
      bb.put(id.getBytes("ISO-8859-1")).putInt(body.length).putShort(0).put(body)
      bb.array()
    }
    val frames = frame("TIT2", title) ++ frame("TPE1", artist)
    val tag = ByteBuffer.allocate(10)
    tag.put("ID3".getBytes).put(3.toByte).put(0.toByte).put(0.toByte)
    // syncsafe size
    val sz = frames.length
    tag.put(((sz >> 21) & 0x7F).toByte).put(((sz >> 14) & 0x7F).toByte)
      .put(((sz >> 7) & 0x7F).toByte).put((sz & 0x7F).toByte)
    // MPEG1 Layer III, 44.1 kHz, stereo: FF FB <bitrate|rate> 00
    val hdr = Array(0xFF.toByte, 0xFB.toByte,
      ((bitrateIdx << 4) | (0 << 2)).toByte, 0x00.toByte)
    tag.array() ++ frames ++ hdr ++ Array.fill(payload)(0x55.toByte)
  }

  /** One Ogg page holding a Vorbis identification header, then a data
    * page carrying the final granule position. */
  private def synthOggVorbis(rate: Int, channels: Int,
      granule: Long): Array[Byte] = {
    def page(granulePos: Long, body: Array[Byte], seq: Int): Array[Byte] = {
      val bb = ByteBuffer.allocate(27 + 1 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("OggS".getBytes).put(0.toByte).put(0.toByte)
      bb.putLong(granulePos).putInt(1234).putInt(seq).putInt(0)
      bb.put(1.toByte).put(body.length.toByte).put(body)
      bb.array()
    }
    val id = ByteBuffer.allocate(30).order(ByteOrder.LITTLE_ENDIAN)
    id.put(1.toByte).put("vorbis".getBytes)
    id.putInt(0) // version
    id.put(channels.toByte)
    id.putInt(rate)
    page(0, id.array(), 0) ++ page(granule, Array.fill(100)(7.toByte), 1)
  }

  test("MP3: ID3v2.3 text frames + frame header + CBR duration estimate") {
    val bytes = synthMp3("My Song", "The Band")
    val m = Codecs.parseMp3(bytes).get
    assert(m.format == "mp3" && m.sampleRate == 44100 && m.channels == 2)
    assert(m.bitrateKbps == 128)
    assert(m.title.contains("My Song") && m.artist.contains("The Band"))
    // payload ≈ 16004 bytes at 128 kbps → ≈ 1000 ms
    assert(math.abs(m.durationMs - 16004 * 8.0 / 128) < 1e-9)
  }

  test("MP3 without a tag still parses from the first frame sync") {
    // tag = 10-byte header + two frames of (10 + encoding byte + 1 char)
    val noTag = synthMp3("x", "y").drop(10 + 2 * 12)
    val m = Codecs.parseMp3(noTag).get
    assert(m.sampleRate == 44100 && m.title.isEmpty)
  }

  test("Ogg/Vorbis: id header fields + granule-clock duration") {
    val bytes = synthOggVorbis(48000, 2, granule = 96000)
    val m = Codecs.parseOgg(bytes).get
    assert(m.format == "ogg/vorbis" && m.sampleRate == 48000 && m.channels == 2)
    assert(math.abs(m.durationMs - 2000.0) < 1e-9)
  }

  test("garbage rejects cleanly across all audio parsers") {
    val junk = "certainly not audio at all".getBytes
    assert(Codecs.parseMp3(junk).isEmpty)
    assert(Codecs.parseOgg(junk).isEmpty)
    assert(Codecs.audioMeta(junk).isEmpty)
    assert(Codecs.parseMp3(Array.empty[Byte]).isEmpty)
    // truncated ID3: declared size beyond the payload must not loop/throw
    val truncated = synthMp3("t", "a").take(14)
    assert(Codecs.parseMp3(truncated).isEmpty)
  }

  test("audioMetadata operator routes WAV/MP3/Ogg rows, drops the rest") {
    import spark.implicits._
    val wav = Codecs.encodeWavPcm16(8000, Array.fill(800)(1000.toShort))
    val mp3 = synthMp3("Tune", "Artist")
    val ogg = synthOggVorbis(44100, 1, 44100)
    val media = Seq((1L, wav), (2L, mp3), (3L, ogg), (4L, "junk".getBytes))
      .toDF("media_id", "content")
    val out = Multimodal.audioMetadata(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L).getString(1) == "wav")
    assert(out(2L).getString(1) == "mp3" && out(2L).getString(6) == "Tune")
    assert(out(3L).getString(1) == "ogg/vorbis" &&
      math.abs(out(3L).getDouble(5) - 1000.0) < 1e-9)
  }

  test("Ogg bytes that fake an MPEG sync still route to the Ogg parser") {
    // id 4346: serial low byte 0xFA right after the comment page's
    // granule -1 (0xFF…) — an unanchored MP3 sync scan bites here
    val m = Codecs.audioMeta(Multimodal.synthAudioContainer(4346L))
      .getOrElse(fail("did not parse"))
    assert(m.format == "ogg/opus", s"misrouted as ${m.format}")
    assert(Codecs.parseMp3(Multimodal.synthOggOpus(4346L)).isEmpty,
      "parseMp3 must reject OggS-headed payloads")
  }

  test("synthetic container sweep round-trips every header field (q_audio_container's invariant)") {
    for (id <- 0L until 60L) {
      val m = Codecs.audioMeta(Multimodal.synthAudioContainer(id))
        .getOrElse(fail(s"id=$id did not parse"))
      val u = id / 3
      (id % 3) match {
        case 0 =>
          assert(m.format == "mp3")
          assert(m.sampleRate == Multimodal.Mp3RateSweep((u % 3).toInt))
          assert(m.channels == (if (u % 2 == 0) 1 else 2))
          assert(m.bitrateKbps == Multimodal.Mp3BitrateSweep((u % 14).toInt))
          assert(m.durationMs == (200 + u % 100) * 8.0 / m.bitrateKbps)
          assert(m.title.contains(s"T$id") && m.artist.contains(s"A${id % 7}"))
        case 1 =>
          assert(m.format == "ogg/vorbis")
          assert(m.sampleRate == Multimodal.VorbisRateSweep((u % 5).toInt))
          assert(m.channels == 1 + (u % 2).toInt && m.bitrateKbps == 0)
          assert(m.durationMs == (1000L + (u * 7) % 96000) * 1000.0 / m.sampleRate)
          assert(m.title.contains(s"T$id") && m.artist.contains(s"A${id % 7}"),
            "VorbisComment TITLE/ARTIST must parse")
        case _ =>
          assert(m.format == "ogg/opus")
          assert(m.sampleRate == 48000 && m.channels == 1 + (u % 2).toInt)
          assert(m.durationMs ==
            (48000L + u % 48000 - (312 + u % 100)) * 1000.0 / 48000)
          assert(m.title.contains(s"T$id") && m.artist.contains(s"A${id % 7}"),
            "OpusTags TITLE/ARTIST must parse")
      }
    }
  }
}
