package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.multimodal.{Codecs, Multimodal}

/** Fuzz hardening for every byte parser: random payloads and
  * bit-flipped VALID payloads must return (None/Nil) or parse — never
  * throw, never stall. The binaryFile ingest path feeds arbitrary
  * bytes from the wild; a parser exception kills a task, a stalled
  * walk kills an executor core (the round-2 advisory's negative-RIFF
  * lesson, generalized). */
class CodecFuzzSpec extends SparkSuite {

  private def forSamples[A](g: Gen[A], n: Int)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }

  private def allParsers(bytes: Array[Byte]): Unit = {
    Codecs.parseMp3(bytes)
    Codecs.parseOgg(bytes)
    Codecs.parseId3v2(bytes)
    Codecs.decodeWavPcm16(bytes)
    Codecs.decodePpm(bytes)
    Codecs.decodeImage(bytes)
    Codecs.decodeFrames(bytes)
    Codecs.audioMeta(bytes)
    Codecs.mp4Meta(bytes)
    Codecs.resizeImageNearest(bytes, 4, 4)
    Codecs.dhash64(bytes)
  }

  test("random byte soup never throws in any parser") {
    val g = for {
      n <- Gen.chooseNum(0, 512)
      bytes <- Gen.containerOfN[Array, Byte](n, Gen.chooseNum(-128, 127).map(_.toByte))
    } yield bytes
    forSamples(g, 60)(allParsers)
  }

  test("magic-prefixed garbage never throws (parsers commit, then must survive)") {
    val magics = Seq("OggS", "RIFF", "ID3", "P6\n", "OpusHead")
      .map(_.getBytes("ISO-8859-1")) :+ Array[Byte](0xFF.toByte, 0xFB.toByte)
    val g = for {
      m <- Gen.oneOf(magics)
      n <- Gen.chooseNum(0, 256)
      tail <- Gen.containerOfN[Array, Byte](n, Gen.chooseNum(-128, 127).map(_.toByte))
    } yield m ++ tail
    forSamples(g, 80)(allParsers)
  }

  test("bit-flipped valid containers never throw") {
    val valids = Seq(
      Multimodal.synthMp3(7L),
      Multimodal.synthOggVorbis(4L),
      Multimodal.synthOggOpus(5L),
      Codecs.encodeWavPcm16(8000, Multimodal.synthSamples(3L)),
      Codecs.encodePng(Multimodal.synthWidth(2L), Multimodal.synthHeight(2L),
        Multimodal.synthPixels(2L)),
      Multimodal.synthMp4(6L), Multimodal.synthMp4(7L))
    val g = for {
      v <- Gen.oneOf(valids)
      pos <- Gen.chooseNum(0, v.length - 1)
      bit <- Gen.chooseNum(0, 7)
    } yield { val c = v.clone(); c(pos) = (c(pos) ^ (1 << bit)).toByte; c }
    forSamples(g, 120)(allParsers)
  }

  test("truncations of valid containers never throw") {
    val valids = Seq(
      Multimodal.synthMp3(11L),
      Multimodal.synthOggVorbis(13L),
      Codecs.encodeWavPcm16(8000, Multimodal.synthSamples(9L)),
      Codecs.encodeGif(Multimodal.synthGifWidth(1L),
        Multimodal.synthGifHeight(1L), Seq(Multimodal.synthGifFrame(1L, 0))),
      Multimodal.synthMp4(12L), Multimodal.synthMp4(13L))
    valids.foreach { v =>
      (0 to v.length by math.max(1, v.length / 23)).foreach { n =>
        allParsers(v.take(n))
      }
    }
  }
}
