package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `BinaryType` columns with typed metadata, plus batch decode /
  * feature-extraction over `mapPartitions`.
  *
  * Decode is REAL for every format the JVM can decode without a
  * third-party codec: PNG/JPEG/GIF/BMP via the JDK's ImageIO, WAV PCM16
  * and P6 PPM via byte parsing, animated GIF as the multi-frame (video
  * analog) path ([[Codecs]]). Only compressed audio/video (MP3/OGG/
  * H.264) lack a JDK decoder; those payloads fall back to the clearly
  * quarantined [[byteFoldFeatures]] featurizer (deterministic, but NOT
  * a decode — documented at each call site).
  *
  * Scale notes: payloads stay opaque bytes end-to-end (no driver
  * collect); decode runs per-partition with constant memory per batch;
  * feature vectors come back as `ArrayType(FloatType)` ready for the
  * Similarity operators.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType))))))

  /** Build a media table from any (id, payload-as-string) source — in
    * production this is `spark.read.format("binaryFile")` or parquet
    * with a binary column; here documents.text stands in as the payload
    * bytes. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast(BinaryType).as("content"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(col("text")).cast(LongType).as("n_bytes")).as("meta"))

  // ---- synthetic image corpus (cross-engine verifiable) ----

  /** Deterministic synthetic-image geometry/pixels, derived purely from
    * the media id with integer arithmetic so a SQL engine can recompute
    * the expected decoded stats analytically — this is what turns the
    * real-codec path into an oracle-checkable query: Spark ENCODES the
    * pixels to PNG and DECODES them back through ImageIO; DuckDB
    * recomputes the same pixel sums from the formula alone. Any codec
    * defect (stride, channel order, color model) breaks the hash. */
  def synthWidth(id: Long): Int = (16 + id % 17).toInt
  def synthHeight(id: Long): Int = (16 + id % 13).toInt
  def synthPixels(id: Long): Array[Byte] = {
    val w = synthWidth(id); val h = synthHeight(id)
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      val x = i % w; val y = i / w
      rgb(3 * i) = ((x * 7 + y * 3 + id * 5) % 256).toByte
      rgb(3 * i + 1) = ((x * 11 + y * 5 + id * 3) % 256).toByte
      rgb(3 * i + 2) = ((x * 13 + y * 7 + id) % 256).toByte
      i += 1
    }
    rgb
  }

  /** One real PNG per document id ([[synthPixels]] formula), batched
    * per partition. Stand-in for a production `binaryFile` image scan
    * with identical downstream plumbing. */
  def syntheticImages(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType))))
    docs.select(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(id, Codecs.encodePng(synthWidth(id), synthHeight(id),
            synthPixels(id)))
        }
      }(enc)
  }

  /** Synthetic NEAR-DUPLICATE image corpus for the perceptual-hash
    * dedup path: documents sharing `doc_id mod 97` get the same base
    * image (geometry and gradient derive from the group, not the doc),
    * and each doc perturbs a sparse deterministic subset of pixels
    * (every (id·7 + x·5 + y·11) ≡ 0 mod 37 pixel brightened by 55) —
    * so same-group hashes land a small Hamming distance apart while
    * cross-group hashes are far. Base channels stay < 200 so the +55
    * never clips, keeping every pixel an exact integer formula of
    * (doc_id, group, x, y) that a SQL engine can replay. */
  def nearDupGroup(id: Long): Long = id % 97
  def nearDupWidth(g: Long): Int = (16 + g % 17).toInt
  def nearDupHeight(g: Long): Int = (16 + g % 13).toInt
  def nearDupPixels(id: Long): Array[Byte] = {
    val g = nearDupGroup(id)
    val w = nearDupWidth(g); val h = nearDupHeight(g)
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      val x = i % w; val y = i / w
      val add = if ((id * 7 + x * 5 + y * 11) % 37 == 0) 55 else 0
      rgb(3 * i) = ((x * 7 + y * 3 + g * 5) % 200 + add).toByte
      rgb(3 * i + 1) = ((x * 11 + y * 5 + g * 3) % 200 + add).toByte
      rgb(3 * i + 2) = ((x * 13 + y * 7 + g) % 200 + add).toByte
      i += 1
    }
    rgb
  }

  /** One real PNG per document id over the [[nearDupPixels]] formula —
    * the image-dedup twin of [[syntheticImages]]. */
  def syntheticNearDupImages(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType))))
    docs.select(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val g = nearDupGroup(id)
          Row(id, Codecs.encodePng(nearDupWidth(g), nearDupHeight(g),
            nearDupPixels(id)))
        }
      }(enc)
  }

  /** Perceptual signatures: REAL decode → [[Codecs.dhash64]] per
    * payload; rows that don't decode are dropped. Output
    * (media_id, sig_hi, sig_lo) feeds the Hamming pigeonhole join. */
  def dhashSignatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("sig_hi", LongType),
      StructField("sig_lo", LongType))))
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          Codecs.dhash64(r.getAs[Array[Byte]](1)).map { case (hi, lo) =>
            Row(r.getLong(0), hi, lo)
          }
        }
      }(enc)
  }

  /** Deterministic synthetic PCM16 samples from the media id — integer
    * arithmetic only, so a SQL engine can recompute the decoded
    * amplitude stats analytically (the audio twin of [[synthPixels]]):
    * n = 64 + id mod 129 samples, s(i) = (i·2003 + id·71) mod 4001 −
    * 2000. Sum of squares stays < 2⁵³ so double accumulation is exact
    * and cross-engine. */
  def synthSampleCount(id: Long): Int = (64 + id % 129).toInt
  def synthSamples(id: Long): Array[Short] = {
    val n = synthSampleCount(id)
    Array.tabulate(n)(i => ((i.toLong * 2003 + id * 71) % 4001 - 2000).toShort)
  }

  /** One real PCM16 WAV per document id, batched per partition —
    * exercises [[Codecs.encodeWavPcm16]] → [[Codecs.decodeWavPcm16]]
    * end-to-end under a SQL-recomputable oracle. */
  def syntheticWavs(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType))))
    docs.select(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(id, Codecs.encodeWavPcm16(8000, synthSamples(id)))
        }
      }(enc)
  }

  // ---- synthetic compressed-audio containers (cross-engine verifiable) ----

  /** Deterministic synthetic MP3 / Ogg-Vorbis / Ogg-Opus container per
    * media id — the compressed-audio twin of [[synthSamples]]: every
    * header field is an integer formula of the id, so a SQL engine can
    * recompute the parsed metadata analytically while Spark pushes the
    * REAL bytes through [[Codecs.audioMeta]]'s container parsers
    * (ID3v2 frame walk + MPEG header, Ogg page walk + codec id
    * headers). id mod 3 picks the format; the per-format variety key
    * is id/3 so each branch sweeps its own parameter space.
    *
    * MP3 (id≡0): ID3v2.3 tag with TIT2="T{id}", TPE1="A{id%7}"; one
    * MPEG-1 Layer III header; frame region of 200 + (id/3)%100 bytes ⇒
    * duration_ms = L·8/bitrate (the parser's CBR estimate).
    * Vorbis (id≡1): id-header page (rate, channels) + EOS page whose
    * granule sets the duration clock. Opus (id≡2): OpusHead page
    * (channels, pre-skip) + EOS granule at the spec's 48 kHz clock. */
  def synthAudioContainer(id: Long): Array[Byte] = (id % 3) match {
    case 0 => synthMp3(id)
    case 1 => synthOggVorbis(id)
    case _ => synthOggOpus(id)
  }

  /** MPEG-1 Layer III bitrates indexable by (id/3)%14 — mirrors the
    * non-zero entries of the parser's table. */
  val Mp3BitrateSweep: Array[Int] =
    Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  val Mp3RateSweep: Array[Int] = Array(44100, 48000, 32000)
  val VorbisRateSweep: Array[Int] = Array(8000, 16000, 22050, 44100, 48000)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int): Array[Byte] =
    Array.tabulate(4)(i => ((v >> (8 * i)) & 0xFF).toByte)
  private def le64(v: Long): Array[Byte] =
    Array.tabulate(8)(i => ((v >> (8 * i)) & 0xFF).toByte)
  private def be32(v: Int): Array[Byte] =
    Array.tabulate(4)(i => ((v >> (8 * (3 - i))) & 0xFF).toByte)

  private def id3Frame(fid: String, text: String): Array[Byte] = {
    val payload = 0.toByte +: text.getBytes("ISO-8859-1") // enc 0 = Latin-1
    fid.getBytes("ISO-8859-1") ++ be32(payload.length) ++
      Array[Byte](0, 0) ++ payload
  }

  private def syncsafe4(v: Int): Array[Byte] =
    Array(((v >> 21) & 0x7F).toByte, ((v >> 14) & 0x7F).toByte,
      ((v >> 7) & 0x7F).toByte, (v & 0x7F).toByte)

  def synthMp3(id: Long): Array[Byte] = {
    val u = id / 3
    val body = id3Frame("TIT2", s"T$id") ++ id3Frame("TPE1", s"A${id % 7}")
    val tag = "ID3".getBytes("ISO-8859-1") ++ Array[Byte](3, 0, 0) ++
      syncsafe4(body.length) ++ body
    val bitrateIdx = 1 + (u % 14).toInt // table slot of Mp3BitrateSweep(u%14)
    val rateIdx = (u % 3).toInt
    val mode = if (u % 2 == 0) 3 else 0 // 3 = mono, 0 = stereo
    val frameLen = (200 + u % 100).toInt
    val frames = new Array[Byte](frameLen)
    frames(0) = 0xFF.toByte
    frames(1) = 0xFB.toByte // MPEG-1, Layer III, no CRC
    frames(2) = ((bitrateIdx << 4) | (rateIdx << 2)).toByte
    frames(3) = (mode << 6).toByte
    tag ++ frames
  }

  /** One Ogg page: 27-byte header + 1-entry segment table + body
    * (bodies here are ≤ 255 bytes, so one lacing value suffices).
    * CRC left 0 — the parser (like many stream tools) doesn't check. */
  private def oggPage(headerType: Int, granule: Long, serial: Long,
      seq: Int, body: Array[Byte]): Array[Byte] = {
    require(body.length <= 255, "single-segment page only")
    "OggS".getBytes("ISO-8859-1") ++
      Array[Byte](0, headerType.toByte) ++ le64(granule) ++
      le32((serial & 0x7FFFFFFF).toInt) ++ le32(seq) ++ le32(0) ++
      Array[Byte](1, body.length.toByte) ++ body
  }

  /** VorbisComment/OpusTags payload (after the magic): vendor string +
    * TITLE/ARTIST comments — the tag block both Ogg codecs share. */
  private def commentBlock(id: Long): Array[Byte] = {
    val vendor = "graft".getBytes("UTF-8")
    def c(s: String) = { val b = s.getBytes("UTF-8"); le32(b.length) ++ b }
    le32(vendor.length) ++ vendor ++ le32(2) ++
      c(s"TITLE=T$id") ++ c(s"ARTIST=A${id % 7}")
  }

  def synthOggVorbis(id: Long): Array[Byte] = {
    val v = id / 3
    val rate = VorbisRateSweep((v % 5).toInt)
    val channels = 1 + (v % 2).toInt
    val granule = 1000L + (v * 7) % 96000
    val idHeader = Array[Byte](1) ++ "vorbis".getBytes("ISO-8859-1") ++
      le32(0) ++ Array(channels.toByte) ++ le32(rate) ++
      le32(0) ++ le32(0) ++ le32(0) ++ Array[Byte](0xB8.toByte, 1)
    val comments = Array[Byte](3) ++ "vorbis".getBytes("ISO-8859-1") ++
      commentBlock(id)
    oggPage(2, 0L, id, 0, idHeader) ++
      oggPage(0, -1L, id, 1, comments) ++
      oggPage(4, granule, id, 2, Array[Byte](0))
  }

  def synthOggOpus(id: Long): Array[Byte] = {
    val w = id / 3
    val channels = 1 + (w % 2).toInt
    val preSkip = (312 + w % 100).toInt
    val granule = 48000L + w % 48000
    val idHeader = "OpusHead".getBytes("ISO-8859-1") ++
      Array[Byte](1, channels.toByte) ++ le16(preSkip) ++
      le32(48000) ++ le16(0) ++ Array[Byte](0)
    val tags = "OpusTags".getBytes("ISO-8859-1") ++ commentBlock(id)
    oggPage(2, 0L, id, 0, idHeader) ++
      oggPage(0, -1L, id, 1, tags) ++
      oggPage(4, granule, id, 2, Array[Byte](0))
  }

  /** One real compressed-audio container per document id, batched per
    * partition — exercises the MP3/Ogg container parsers end-to-end
    * under a SQL-recomputable oracle (the compressed-audio analog of
    * [[syntheticWavs]]). */
  def syntheticAudioContainers(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType))))
    docs.select(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(id, synthAudioContainer(id))
        }
      }(enc)
  }

  // ---- featurizers ----

  /** FALLBACK featurizer for payloads with no JVM decoder (compressed
    * audio/video, unknown bytes): folds raw bytes into a fixed-size
    * vector. Deterministic and useful as an opaque content signature,
    * but NOT a decode — image payloads never take this path. */
  def byteFoldFeatures(content: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < content.length) {
      out(i % dim) += (content(i) & 0xFF) / 255.0f
      i += 1
    }
    out
  }

  /** REAL image features: decode via ImageIO, luma histogram with `dim`
    * buckets normalized by pixel count. None when the payload is not a
    * decodable image. */
  def imageFeatures(content: Array[Byte], dim: Int): Option[Array[Float]] =
    Codecs.decodeImage(content, nBuckets = dim).map { st =>
      val n = math.max(1L, st.nPixels).toFloat
      st.lumaHist.map(_ / n)
    }

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("dim", IntegerType),
    StructField("is_decoded", BooleanType),
    StructField("features", ArrayType(FloatType))))

  /** Batch feature extraction: mapPartitions over the media table —
    * the Scala analog of pandas-UDF batch decode. Decodable images get
    * REAL pixel features ([[imageFeatures]]); everything else falls
    * back to [[byteFoldFeatures]], flagged by `is_decoded`. Rows
    * streamed, never materialized per-partition. */
  def extractFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          imageFeatures(bytes, dim) match {
            case Some(f) => Row(id, dim, true, f.toSeq)
            case None    => Row(id, dim, false, byteFoldFeatures(bytes, dim).toSeq)
          }
        }
      }(enc)
  }

  // ---- synthetic animated GIFs (cross-engine verifiable) ----

  /** Deterministic synthetic animated-GIF geometry/pixels — the
    * multi-frame (video analog) twin of [[synthPixels]]. Frames are
    * GRAYSCALE: gray(x,y,f) = (x·7 + y·3 + id·5 + f·11) mod 256, so
    * the frame has ≤ 256 distinct colors (lossless through the GIF
    * palette — round-trip proven pixel-exact in ImageIoSpec) and
    * integer luma (299v+587v+114v)/1000 = v exactly, which makes every
    * decoded stat an integer formula a SQL engine can recompute. */
  def synthGifWidth(id: Long): Int = (8 + id % 9).toInt
  def synthGifHeight(id: Long): Int = (8 + id % 7).toInt
  def synthGifFrames(id: Long): Int = (2 + id % 4).toInt
  def synthGifFrame(id: Long, f: Int): Array[Byte] = {
    val w = synthGifWidth(id); val h = synthGifHeight(id)
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      val x = i % w; val y = i / w
      val v = ((x * 7 + y * 3 + id * 5 + f * 11) % 256).toByte
      rgb(3 * i) = v; rgb(3 * i + 1) = v; rgb(3 * i + 2) = v
      i += 1
    }
    rgb
  }

  /** One real animated GIF per document id (2–5 frames), batched per
    * partition — the multi-frame stand-in for a production video scan,
    * exercising [[Codecs.encodeGif]] → [[Codecs.decodeFrames]] under a
    * SQL-recomputable oracle. */
  def syntheticGifs(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType))))
    docs.select(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val frames = (0 until synthGifFrames(id)).map(synthGifFrame(id, _))
          Row(id, Codecs.encodeGif(synthGifWidth(id), synthGifHeight(id),
            frames))
        }
      }(enc)
  }

  /** Even sampling of `nFrames` indices over `nAvail` frames — first
    * and last always included, shared by [[sampleFrames]] and
    * [[sampleFrameStats]] (and mirrored by the oracle's integer
    * division f·(F−1)/(n−1)). */
  private[multimodal] def evenFrameIdx(f: Int, nAvail: Int, nFrames: Int): Int =
    if (nFrames == 1) 0 else f * (nAvail - 1) / (nFrames - 1)

  private val frameSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("is_decoded", BooleanType),
    StructField("features", ArrayType(FloatType))))

  /** Frame-sampling operator: one row per sampled frame per media item,
    * batched per partition like [[extractFeatures]]. Multi-frame
    * payloads (animated GIF — the JDK-decodable video analog) are REALLY
    * decoded and `nFrames` frames sampled evenly across the animation;
    * single images count as one frame; undecodable payloads fall back
    * to byte-fold over `nFrames` even slices (flagged). */
  def sampleFrames(media: DataFrame, nFrames: Int = 4, dim: Int = 8): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(frameSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val frames = Codecs.decodeFrames(bytes, nBuckets = dim)
          if (frames.nonEmpty) {
            (0 until nFrames).map { f =>
              val src = evenFrameIdx(f, frames.length, nFrames)
              val st = frames(src)
              val n = math.max(1L, st.nPixels).toFloat
              Row(id, f, true, st.lumaHist.map(_ / n).toSeq)
            }
          } else {
            val chunk = math.max(1, bytes.length / nFrames)
            (0 until nFrames).map { f =>
              val start = f * chunk
              val slice = bytes.slice(start, math.min(start + chunk, bytes.length))
              Row(id, f, false, byteFoldFeatures(slice, dim).toSeq)
            }
          }
        }
      }(enc)
  }

  private val frameStatsSchema = StructType(
    Seq(StructField("media_id", LongType),
        StructField("frame_idx", IntegerType),
        StructField("src_frame", IntegerType),
        StructField("n_frames", IntegerType),
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("sum_r", LongType),
        StructField("sum_g", LongType),
        StructField("sum_b", LongType)) ++
      (0 until 8).map(i => StructField(s"h$i", LongType)))

  /** Integer-exact twin of [[sampleFrames]]: the same REAL multi-frame
    * decode ([[Codecs.decodeFrames]]) and the same even frame
    * selection, but emitting the decoded frames' exact integer pixel
    * stats (channel sums + 8-bucket luma histogram) instead of
    * normalized float features — the oracle-checkable shape for the
    * frame-sampling path. Undecodable payloads are dropped (the
    * feature variant's byte-fold fallback is for featurization, not
    * stats). */
  def sampleFrameStats(media: DataFrame, nFrames: Int = 4): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(frameStatsSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val frames = Codecs.decodeFrames(r.getAs[Array[Byte]](1))
          (0 until (if (frames.isEmpty) 0 else nFrames)).map { f =>
            val src = evenFrameIdx(f, frames.length, nFrames)
            val st = frames(src)
            Row.fromSeq(Seq[Any](id, f, src, frames.length,
              st.width, st.height, st.sumR, st.sumG, st.sumB) ++ st.lumaHist)
          }
        }
      }(enc)
  }

  /** Batch thumbnail pass: every decodable image resized to a fixed
    * (targetW × targetH) via nearest-neighbor ([[Codecs
    * .resizeImageNearest]] — source index = exact integer division
    * dstIdx·srcDim/dstDim) and re-encoded PNG; undecodable payloads
    * are dropped. Composes with [[imagePixelStats]] for the oracle-
    * checkable resize query. */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType))))
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          Codecs.resizeImageNearest(r.getAs[Array[Byte]](1), targetW, targetH)
            .map(Row(r.getLong(0), _))
        }
      }(enc)
  }

  // ---- stats operators ----

  private val audioSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("n_samples", IntegerType),
    StructField("duration_ms", DoubleType),
    StructField("rms", DoubleType),
    StructField("peak", IntegerType)))

  /** REAL audio decode (PCM16 WAV — [[Codecs.decodeWavPcm16]], pure
    * byte parsing, no codec library): one stats row per decodable
    * payload, non-WAV rows dropped. Same per-partition batch shape as
    * [[extractFeatures]]. */
  def audioStats(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(audioSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          Codecs.decodeWavPcm16(r.getAs[Array[Byte]](1)).map { w =>
            Row(r.getLong(0), w.sampleRate, w.nSamples, w.durationMs,
              w.rms, w.peak)
          }
        }
      }(enc)
  }

  private val audioMetaSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("format", StringType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bitrate_kbps", IntegerType),
    StructField("duration_ms", DoubleType),
    StructField("title", StringType),
    StructField("artist", StringType)))

  /** Container-level audio metadata ([[Codecs.audioMeta]]): WAV rows
    * carry REAL decode stats; MP3/Ogg rows carry REAL container
    * parsing (ID3 text frames, MPEG frame header, Ogg granule clock) —
    * only the compressed-sample decode itself is out of scope (no JDK
    * codec). Unparseable payloads are dropped. */
  def audioMetadata(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(audioMetaSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          Codecs.audioMeta(r.getAs[Array[Byte]](1)).map { m =>
            Row(r.getLong(0), m.format, m.sampleRate, m.channels,
              m.bitrateKbps, m.durationMs,
              m.title.orNull, m.artist.orNull)
          }
        }
      }(enc)
  }

  // ---- video containers (ISO-BMFF) ----

  private def be64(v: Long): Array[Byte] =
    Array.tabulate(8)(i => ((v >> (8 * (7 - i))) & 0xFF).toByte)

  private def mp4Box(t: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8) ++ t.getBytes("ISO-8859-1") ++ payload

  /** `size == 1` + 64-bit largesize form (how real muxers write big
    * mdat boxes) — synthesized so the parser's largesize path stays
    * exercised by the oracle, not just by fuzz. */
  private def mp4LargeBox(t: String, payload: Array[Byte]): Array[Byte] =
    be32(1) ++ t.getBytes("ISO-8859-1") ++ be64(payload.length + 16L) ++
      payload

  /** Deterministic minimal MP4: every mvhd/tkhd/hdlr field an integer
    * formula of `id`, both mvhd/tkhd versions exercised (v1's 64-bit
    * times shift every offset — id parity selects), a `skip` box
    * before moov and an mdat AFTER it (largesize form on id%3==0) so
    * the walk must actually skip unknown/opaque boxes. Track 0 is the
    * video track (tkhd carries 16.16 width/height); ids with
    * nTracks ≥ 2 add a sound track, ≥ 3 a timed-metadata track. */
  def synthMp4(id: Long): Array[Byte] = {
    val v = (id % 2).toInt
    val brand = if (v == 0) "isom" else "mp42"
    val timescale = (600 + (id % 5) * 100).toInt
    val durUnits = 1000 + (id % 9000)
    val nTracks = (1 + id % 3).toInt
    val w = (160 + 16 * (id % 20)).toInt
    val h = (120 + 8 * (id % 15)).toInt
    val ftyp = mp4Box("ftyp",
      brand.getBytes("ISO-8859-1") ++ be32(0) ++
        brand.getBytes("ISO-8859-1"))
    val mvhd = mp4Box("mvhd",
      (if (v == 1)
        Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
          be32(timescale) ++ be64(durUnits)
      else
        Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
          be32(timescale) ++ be32(durUnits.toInt)) ++
        be32(0x00010000) ++ Array[Byte](1, 0) ++ new Array[Byte](10) ++
        new Array[Byte](36) ++ new Array[Byte](24) ++ be32(nTracks + 1))
    def trak(idx: Int, handler: String, tw: Int, th: Int) = {
      val tkhd = mp4Box("tkhd",
        (if (v == 1)
          Array[Byte](1, 0, 0, 7) ++ be64(0) ++ be64(0) ++
            be32(idx + 1) ++ be32(0) ++ be64(durUnits)
        else
          Array[Byte](0, 0, 0, 7) ++ be32(0) ++ be32(0) ++
            be32(idx + 1) ++ be32(0) ++ be32(durUnits.toInt)) ++
          new Array[Byte](8) ++ new Array[Byte](8) ++
          new Array[Byte](36) ++ be32(tw << 16) ++ be32(th << 16))
      val hdlr = mp4Box("hdlr",
        be32(0) ++ be32(0) ++ handler.getBytes("ISO-8859-1") ++
          new Array[Byte](12) ++ Array[Byte]('g', 0))
      mp4Box("trak", tkhd ++ mp4Box("mdia", hdlr))
    }
    val handlers = Seq("vide", "soun", "meta").take(nTracks)
    val traks = handlers.zipWithIndex.map { case (hd, i) =>
      trak(i, hd, if (hd == "vide") w else 0, if (hd == "vide") h else 0)
    }.reduce(_ ++ _)
    val moov = mp4Box("moov", mvhd ++ traks)
    val junk = Array.tabulate((id % 17).toInt + 1)(i =>
      ((id + i) % 251).toByte)
    val mdat = if (id % 3 == 0) mp4LargeBox("mdat", junk)
      else mp4Box("mdat", junk)
    ftyp ++ mp4Box("skip", junk) ++ moov ++ mdat
  }

  /** One synthetic MP4 per document (media_id = doc_id) — row-local,
    * embarrassingly parallel. */
  def syntheticVideos(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType))))
    docs.select(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(id, synthMp4(id))
        }
      }(enc)
  }

  private val videoMetaSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("format", StringType),
    StructField("brand", StringType),
    StructField("timescale", IntegerType),
    StructField("duration_ms", DoubleType),
    StructField("n_tracks", IntegerType),
    StructField("n_video", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Container-level video metadata ([[Codecs.mp4Meta]]) — undecodable
    * payloads dropped, like [[audioMetadata]]. */
  def videoMetadata(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(videoMetaSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          Codecs.mp4Meta(r.getAs[Array[Byte]](1)).map { m =>
            Row(r.getLong(0), m.format, m.brand, m.timescale,
              m.durationMs, m.nTracks, m.nVideoTracks, m.width, m.height)
          }
        }
      }(enc)
  }

  private val imageSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_luma", DoubleType)))

  /** REAL image decode — P6 PPM via byte parsing, PNG/JPEG/GIF/BMP via
    * the JDK's ImageIO: width, height, mean luma per decodable payload,
    * the rest dropped. */
  def imageStats(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(imageSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val id = r.getLong(0)
          Codecs.decodePpm(bytes)
            .map(p => Row(id, p.width, p.height, p.meanLuma))
            .orElse(Codecs.decodeImage(bytes)
              .map(s => Row(id, s.width, s.height, s.meanLuma)))
        }
      }(enc)
  }

  private val pixelStatsSchema = StructType(
    Seq(StructField("media_id", LongType),
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("sum_r", LongType),
        StructField("sum_g", LongType),
        StructField("sum_b", LongType)) ++
      (0 until 8).map(i => StructField(s"h$i", LongType)))

  /** Exact integer pixel statistics from a REAL ImageIO decode: channel
    * sums plus an 8-bucket integer-luma histogram. All-integer output
    * hashes bit-identically for lossless formats, which is what lets a
    * SQL oracle verify the codec path end to end. */
  def imagePixelStats(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(pixelStatsSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          Codecs.decodeImage(r.getAs[Array[Byte]](1)).map { s =>
            Row.fromSeq(Seq[Any](r.getLong(0), s.width, s.height,
              s.sumR, s.sumG, s.sumB) ++ s.lumaHist)
          }
        }
      }(enc)
  }
}
