package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{Codecs, Multimodal}

/** REAL compressed-image decode via the JDK's ImageIO (PNG/JPEG/GIF)
  * and the operators built on it: exact pixel stats for lossless
  * formats, nearest-neighbor resize, animated-GIF frame sampling, and
  * the synthetic-image corpus whose decoded stats a SQL engine can
  * recompute analytically (the q_multimodal_features oracle). */
class ImageIoSpec extends SparkSuite {

  private def gradient(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((i * 7 + i / 3) % 256).toByte)

  test("PNG round-trip: decoded pixel stats are byte-exact") {
    val (w, h) = (23, 11)
    val rgb = gradient(w, h)
    val st = Codecs.decodeImage(Codecs.encodePng(w, h, rgb)).get
    assert(st.width == w && st.height == h)
    var (sr, sg, sb) = (0L, 0L, 0L)
    val hist = new Array[Long](8)
    (0 until w * h).foreach { i =>
      val r = rgb(3 * i) & 0xFF; val g = rgb(3 * i + 1) & 0xFF
      val b = rgb(3 * i + 2) & 0xFF
      sr += r; sg += g; sb += b
      hist((299 * r + 587 * g + 114 * b) / 1000 / 32) += 1
    }
    assert(st.sumR == sr && st.sumG == sg && st.sumB == sb)
    assert(st.lumaHist.toSeq == hist.toSeq)
  }

  test("JPEG decodes for real: exact dims, stats within lossy tolerance") {
    val (w, h) = (32, 16)
    val rgb = Array.tabulate(w * h * 3)(i => (((i / 3) % w) * 8 % 256).toByte)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w * h).foreach { i =>
      img.setRGB(i % w, i / w,
        ((rgb(3 * i) & 0xFF) << 16) | ((rgb(3 * i + 1) & 0xFF) << 8) |
          (rgb(3 * i + 2) & 0xFF))
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val st = Codecs.decodeImage(bos.toByteArray).get
    assert(st.width == w && st.height == h)
    // lossy but close: mean channel value within 3 of the source
    val n = (w * h).toLong
    var srcSum = 0L
    (0 until w * h).foreach(i => srcSum += rgb(3 * i) & 0xFF)
    assert(math.abs(st.sumR / n.toDouble - srcSum / n.toDouble) < 3.0)
  }

  test("garbage and truncated payloads decode to None, never throw") {
    assert(Codecs.decodeImage("not an image".getBytes).isEmpty)
    assert(Codecs.decodeImage(Array.empty[Byte]).isEmpty)
    val png = Codecs.encodePng(8, 8, gradient(8, 8))
    assert(Codecs.decodeImage(png.take(20)).isEmpty)
  }

  test("nearest-neighbor resize: exact expected pixels at integer ratios") {
    val (w, h) = (8, 8)
    val rgb = gradient(w, h)
    val resized = Codecs.resizeImageNearest(Codecs.encodePng(w, h, rgb), 4, 4).get
    val st = Codecs.decodeImage(resized).get
    assert(st.width == 4 && st.height == 4)
    // NN at 2:1 keeps pixels (2x, 2y): recompute expected sums directly
    var sr = 0L
    (0 until 4).foreach { y => (0 until 4).foreach { x =>
      sr += rgb(3 * (2 * y * w + 2 * x)) & 0xFF } }
    assert(st.sumR == sr)
    assert(Codecs.resizeImageNearest("junk".getBytes, 4, 4).isEmpty)
    assert(Codecs.resizeImageNearest(Codecs.encodePng(w, h, rgb), 0, 4).isEmpty)
  }

  test("animated GIF: frame decode and even sampling through the operator") {
    import spark.implicits._
    val (w, h) = (10, 6)
    // 5 frames of uniform gray, value stepping 40 per frame (grayscale
    // survives GIF palettization exactly)
    val gif = Codecs.encodeGif(w, h,
      (0 until 5).map(f => Array.fill(w * h * 3)((40 * f + 20).toByte)))
    val frames = Codecs.decodeFrames(gif)
    assert(frames.length == 5)
    assert(frames.forall(f => f.width == w && f.height == h))
    assert(frames.map(_.sumR).distinct.length == 5, "frames must differ")

    val media = Seq((7L, gif)).toDF("media_id", "content")
    val sampled = Multimodal.sampleFrames(media, nFrames = 3, dim = 8).collect()
    assert(sampled.length == 3)
    assert(sampled.forall(_.getBoolean(2)), "GIF frames are really decoded")
    // even sampling over 5 frames at n=3 picks source frames 0, 2, 4
    val fullHists = frames.map(f => f.lumaHist.map(_ / f.nPixels.toFloat).toSeq)
    assert(sampled.map(_.getSeq[Float](3)).toSeq ==
      Seq(fullHists(0), fullHists(2), fullHists(4)))
  }

  test("synthetic animated GIFs: gray palette round-trip is pixel-exact, stats match the formula") {
    import spark.implicits._
    // the q_frame_sample invariant: grayscale frames (≤256 colors)
    // survive the GIF palette losslessly, so decoded sums/histograms
    // equal the synthesis formula exactly — per frame, per id
    for (id <- Seq(0L, 3L, 7L, 12L, 25L)) {
      val w = Multimodal.synthGifWidth(id); val h = Multimodal.synthGifHeight(id)
      val nf = Multimodal.synthGifFrames(id)
      val gif = Codecs.encodeGif(w, h,
        (0 until nf).map(Multimodal.synthGifFrame(id, _)))
      val frames = Codecs.decodeFrames(gif)
      assert(frames.length == nf)
      (0 until nf).foreach { f =>
        var expSum = 0L
        val expHist = new Array[Long](8)
        for (y <- 0 until h; x <- 0 until w) {
          val v = (x * 7 + y * 3 + id * 5 + f * 11) % 256
          expSum += v; expHist((v / 32).toInt) += 1
        }
        val st = frames(f)
        assert(st.sumR == expSum && st.sumG == expSum && st.sumB == expSum,
          s"id=$id frame=$f channel sums")
        assert(st.lumaHist.sameElements(expHist), s"id=$id frame=$f hist")
      }
    }

    // sampleFrameStats: src selection is the shared integer division,
    // undecodable rows drop, 4 rows per decodable item
    val id = 7L // 2 + 7%4 = 5 frames
    val gif = Codecs.encodeGif(Multimodal.synthGifWidth(id),
      Multimodal.synthGifHeight(id),
      (0 until Multimodal.synthGifFrames(id)).map(Multimodal.synthGifFrame(id, _)))
    val media = Seq((id, gif), (99L, "junk".getBytes)).toDF("media_id", "content")
    val out = Multimodal.sampleFrameStats(media, nFrames = 4).collect()
    assert(out.length == 4 && out.forall(_.getLong(0) == id))
    assert(out.map(r => (r.getInt(1), r.getInt(2))).toSeq
      .sorted == Seq((0, 0), (1, 1), (2, 2), (3, 4))) // f*(5-1)/3
    assert(out.forall(_.getInt(3) == 5))
  }

  test("imageStats accepts PPM and ImageIO formats alike") {
    import spark.implicits._
    val ppm = Codecs.encodePpm(2, 2, Array.fill(12)(100.toByte))
    val png = Codecs.encodePng(3, 3, Array.fill(27)(50.toByte))
    val media = Seq((1L, ppm), (2L, png), (3L, "junk".getBytes))
      .toDF("media_id", "content")
    val out = Multimodal.imageStats(media).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(3))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L)._1 == 2 && math.abs(out(1L)._2 - 100.0) < 1e-9)
    assert(out(2L)._1 == 3 && math.abs(out(2L)._2 - 50.0) < 1e-9)
  }

  test("synthetic corpus: encode → ImageIO decode reproduces the pixel formula") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val stats = Multimodal.imagePixelStats(Multimodal.syntheticImages(docs))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(stats.size == 40)
    (0L until 40L).foreach { id =>
      val w = Multimodal.synthWidth(id); val h = Multimodal.synthHeight(id)
      val rgb = Multimodal.synthPixels(id)
      var (sr, sg, sb) = (0L, 0L, 0L)
      (0 until w * h).foreach { i =>
        sr += rgb(3 * i) & 0xFF; sg += rgb(3 * i + 1) & 0xFF
        sb += rgb(3 * i + 2) & 0xFF
      }
      val r = stats(id)
      assert(r.getInt(1) == w && r.getInt(2) == h)
      assert(r.getLong(3) == sr && r.getLong(4) == sg && r.getLong(5) == sb)
      assert((6 until 14).map(r.getLong).sum == w.toLong * h)
    }
  }
}
