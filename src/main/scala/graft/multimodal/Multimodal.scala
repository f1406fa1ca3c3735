package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `BinaryType` columns with typed metadata, plus batch decode /
  * feature-extraction over `mapPartitions`.
  *
  * The Spark-side contract (schema, partitioning, batch shape, row
  * mapping) is real and tested; the actual media DECODE IS A STUB — this
  * container ships no image/audio codecs — marked below. Swapping
  * [[decodeStub]] for a real decoder (JavaCV, TwelveMonkeys, ffmpeg via
  * pipe) changes no plumbing.
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

  /** STUB decoder ??? in spirit: a real implementation would decode
    * image bytes and emit pixel features. This deterministic fake folds
    * the bytes into a fixed-size float vector so the downstream plumbing
    * (batching, schema, similarity hand-off) is fully exercised. */
  def decodeStub(content: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < content.length) {
      out(i % dim) += (content(i) & 0xFF) / 255.0f
      i += 1
    }
    out
  }

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("dim", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** STUB resize ??? in spirit: a real implementation decodes, scales
    * with an image library, re-encodes. This deterministic fake keeps
    * every `stride`-th byte so output size tracks the requested scale —
    * the plumbing contract (bytes in, smaller bytes out, per-partition
    * batching) is what's real. */
  def resizeStub(content: Array[Byte], stride: Int): Array[Byte] = {
    val out = new Array[Byte]((content.length + stride - 1) / stride)
    var i = 0
    while (i < out.length) { out(i) = content(i * stride); i += 1 }
    out
  }

  /** STUB frame sampling ??? in spirit: a real implementation seeks N
    * keyframes via a video codec. The fake slices the payload into N
    * chunks and emits one feature vector per "frame". */
  def frameSampleStub(content: Array[Byte], nFrames: Int, dim: Int): Seq[Array[Float]] = {
    val chunk = math.max(1, content.length / nFrames)
    (0 until nFrames).map { f =>
      val start = f * chunk
      decodeStub(content.slice(start, math.min(start + chunk, content.length)), dim)
    }
  }

  private val frameSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** Frame-sampling operator: one row per sampled frame per media item
    * (video → frames analog), batched per partition like
    * [[extractFeatures]]. */
  def sampleFrames(media: DataFrame, nFrames: Int = 4, dim: Int = 8): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(frameSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          frameSampleStub(bytes, nFrames, dim).zipWithIndex.map {
            case (feat, i) => Row(id, i, feat.toSeq)
          }
        }
      }(enc)
  }

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

  private val imageSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_luma", DoubleType)))

  /** REAL image decode (binary P6 PPM — [[Codecs.decodePpm]]): width,
    * height, mean luma per decodable payload. */
  def imageStats(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(imageSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          Codecs.decodePpm(r.getAs[Array[Byte]](1)).map { p =>
            Row(r.getLong(0), p.width, p.height, p.meanLuma)
          }
        }
      }(enc)
  }

  /** Batch feature extraction: mapPartitions over the media table —
    * the Scala analog of pandas-UDF batch decode. One decoder instance
    * per partition (where a real codec would be initialized), rows
    * streamed, never materialized per-partition. */
  def extractFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        // real decoder init would happen here, once per partition
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          Row(id, dim, decodeStub(bytes, dim).toSeq)
        }
      }(enc)
  }
}
