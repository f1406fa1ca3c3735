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
