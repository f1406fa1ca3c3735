package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{Codecs, Multimodal}

/** Real uncompressed-media decode: WAV PCM16 and P6 PPM parsed from
  * raw bytes (no codec library), both standalone and through the
  * mapPartitions batch operators. */
class CodecsSpec extends SparkSuite {

  private def sineWav(sampleRate: Int, hz: Double, amp: Double,
      n: Int): Array[Byte] = {
    val samples = Array.tabulate(n)(i =>
      (amp * math.sin(2 * math.Pi * hz * i / sampleRate)).toShort)
    Codecs.encodeWavPcm16(sampleRate, samples)
  }

  test("WAV round-trip: sine amplitude stats match theory") {
    val bytes = sineWav(8000, 440, 10000, 8000)
    val info = Codecs.decodeWavPcm16(bytes).get
    assert(info.sampleRate == 8000 && info.channels == 1 && info.bitsPerSample == 16)
    assert(info.nSamples == 8000)
    assert(math.abs(info.durationMs - 1000.0) < 1e-9)
    // RMS of a sine = A/sqrt(2); quantization keeps it within 1%
    assert(math.abs(info.rms - 10000 / math.sqrt(2)) / (10000 / math.sqrt(2)) < 0.01)
    assert(info.peak <= 10000 && info.peak > 9900)
  }

  test("WAV parser rejects non-WAV and non-PCM payloads") {
    assert(Codecs.decodeWavPcm16("just some text".getBytes).isEmpty)
    assert(Codecs.decodeWavPcm16(Array.empty[Byte]).isEmpty)
    val corrupted = sineWav(8000, 440, 1000, 100)
    corrupted(20) = 3 // audioFormat = not PCM
    assert(Codecs.decodeWavPcm16(corrupted).isEmpty)
  }

  test("PPM round-trip: gradient image dims and mean luma") {
    val (w, h) = (4, 2)
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 7) % 256).toByte)
    val bytes = Codecs.encodePpm(w, h, rgb)
    val info = Codecs.decodePpm(bytes).get
    assert(info.width == w && info.height == h && info.maxVal == 255)
    val expected = (0 until w * h).map { p =>
      0.299 * (rgb(3 * p) & 0xFF) + 0.587 * (rgb(3 * p + 1) & 0xFF) +
        0.114 * (rgb(3 * p + 2) & 0xFF)
    }.sum / (w * h)
    assert(math.abs(info.meanLuma - expected) < 1e-9)
    assert(Codecs.decodePpm("P3\n1 1\n255\n0 0 0".getBytes).isEmpty)
  }

  test("audioStats / imageStats operators decode mixed media, drop the rest") {
    import spark.implicits._
    val wav = sineWav(16000, 1000, 5000, 1600)
    val ppm = Codecs.encodePpm(2, 2, Array.fill(12)(100.toByte))
    val junk = "not media".getBytes
    val media = Seq((1L, wav), (2L, ppm), (3L, junk))
      .toDF("media_id", "content")

    val audio = Multimodal.audioStats(media).collect()
    assert(audio.length == 1 && audio.head.getLong(0) == 1L)
    assert(audio.head.getAs[Int]("sample_rate") == 16000)
    assert(math.abs(audio.head.getAs[Double]("duration_ms") - 100.0) < 1e-9)

    val images = Multimodal.imageStats(media).collect()
    assert(images.length == 1 && images.head.getLong(0) == 2L)
    assert(images.head.getAs[Int]("width") == 2)
    assert(math.abs(images.head.getAs[Double]("mean_luma") - 100.0) < 1e-9)
  }
}
