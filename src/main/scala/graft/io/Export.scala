package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sharded training-export sink: size-targeted jsonl.gz shards — the
  * format training consumers actually read — closing the gap between
  * [[graft.text.Curation.materialize]]'s partitioned parquet and a
  * release a data loader can stream.
  *
  *  - '''Shard assignment''' ([[shardPlan]]) is deterministic and
  *    engine-replayable: shard = (payload bytes before this doc, in
  *    doc_id order within source) div `targetBytes` — the
  *    [[graft.text.Packing.chunkByBudget]] window shape, so a shard
  *    can overflow by at most one document and assignment is one
  *    windowed pass partitioned by source (no global sort, no
  *    sequential state). The size model is payload (text) bytes:
  *    per-row JSON overhead is near-constant and engine-specific
  *    escaping must not decide shard boundaries.
  *  - '''Writing''' ([[writeJsonlShards]]): one gzip jsonl file per
  *    shard — rows are `repartition(source, shard)`-ed so every
  *    shard's rows land in exactly one task, then `partitionBy`
  *    splits them into `source=…/shard=…/` directories. Parallelism =
  *    shard count, the honest bound for size-bounded output files.
  *  - '''Round trip''': `ExportSpec` re-reads a written export and
  *    proves per-source doc counts, token mass, and the
  *    order-independent bit_xor content fingerprint match
  *    [[graft.text.Curation.manifest]] of the input — the same
  *    integrity line `q_corpus_manifest` ships.
  */
object Export {

  /** One JSON line per document, fixed field order. */
  private val lineSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("text", StringType)))

  /** (doc_id, source, text, n_bytes, shard): size-targeted shard
    * assignment, deterministic in (source, doc_id). */
  def shardPlan(docs: DataFrame, targetBytes: Long): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col("doc_id"), col("source"), col("text"),
        octet_length(coalesce(col("text"), lit(""))).cast("long").as("n_bytes"))
      .withColumn("cum_before", coalesce(sum(col("n_bytes")).over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("text"), col("n_bytes"),
        expr(s"cum_before div $targetBytes").as("shard"))
  }

  /** Write `docs` as `source=…/shard=…/part-….txt.gz` jsonl under
    * `path` and return the shard manifest (source, shard, n_docs,
    * n_bytes) the release ships alongside the files. */
  def writeJsonlShards(docs: DataFrame, path: String,
      targetBytes: Long): DataFrame = {
    val planned = shardPlan(docs, targetBytes)
    planned
      .select(col("source"), col("shard"),
        to_json(struct(col("doc_id"), col("source"), col("text")))
          .as("value"))
      .repartition(col("source"), col("shard"))
      .write.mode("overwrite")
      .partitionBy("source", "shard")
      .option("compression", "gzip")
      .text(path)
    planned.groupBy("source", "shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_bytes")).as("n_bytes"))
  }

  /** Re-read a written export (gzip-transparent; partition columns
    * recovered from the directory layout, JSON fields from the
    * lines). */
  def readJsonlShards(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(col("shard"), from_json(col("value"), lineSchema).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.source").as("source"),
        col("r.text").as("text"), col("shard"))
}
