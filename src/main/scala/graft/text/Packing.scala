package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing — assigning documents to fixed token budgets, the
  * step between a curated corpus and a training run. Two shapes:
  *
  *  - [[chunkByBudget]]: bin = prefix-token-sum div budget. A pure
  *    window computation (partitioned by source — no global sort, no
  *    sequential state), at the cost of bins that can overflow by up
  *    to one document. The 100 TB default.
  *  - [[nextFitBins]]: exact next-fit — a bin closes when the next
  *    document would overflow it, so no bin exceeds the budget (a
  *    document larger than the budget gets a bin alone). Inherently
  *    sequential per source; runs as one sorted pass per source
  *    partition (the secondary-sort pattern: repartition by source,
  *    sortWithinPartitions, constant-memory iterator). Parallelism =
  *    number of sources, which is the honest bound for an
  *    order-dependent packing.
  *
  * Both are deterministic (doc_id order within source) and engine-
  * recomputable — the oracle mirrors the window arithmetic and replays
  * the next-fit recursion in a recursive CTE. */
object Packing {

  private def sized(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      TextStats.tokenCount(col("text")).as("n_tokens"))

  /** (doc_id, source, n_tokens, bin): bin = (tokens before this doc,
    * doc_id order within source) div budget. */
  def chunkByBudget(docs: DataFrame, budget: Long): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    sized(docs)
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens").cast("long")).over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        expr(s"cum_before div $budget").as("bin"))
  }

  private val nextFitSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("n_tokens", IntegerType),
    StructField("bin", LongType)))

  /** Exact next-fit packing per source (see object doc). */
  def nextFitBins(docs: DataFrame, budget: Long): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(nextFitSchema)
    sized(docs)
      .repartition(col("source"))
      .sortWithinPartitions(col("source"), col("doc_id"))
      .mapPartitions { rows =>
        // several sources can share a partition; state resets on the
        // source boundary (rows arrive sorted by (source, doc_id))
        var curSource: String = null
        var bin = 0L; var binSum = 0L
        rows.map { r =>
          val src = r.getString(1); val n = r.getInt(2)
          if (src != curSource) { curSource = src; bin = 0L; binSum = 0L }
          if (binSum > 0 && binSum + n > budget) { bin += 1; binSum = 0L }
          binSum += n
          Row(r.getLong(0), src, n, bin)
        }
      }(enc)
  }
}
