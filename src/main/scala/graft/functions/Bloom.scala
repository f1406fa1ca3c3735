package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bloom-filter pre-join pruning — Spark's own runtime-filter
  * machinery (`BloomFilterAggregate` / `BloomFilterMightContain`, the
  * expressions `InjectRuntimeFilter` plants under AQE) surfaced as an
  * explicit operator for the ingest gate.
  *
  * The 100 TB shape: an incremental batch checked against a huge lake
  * must not shuffle the lake per batch. The lake's key set is
  * summarized ONCE into a bounded bitset (numBits is the budget — the
  * sketch size is fixed regardless of lake rows), built distributedly
  * by a partial-aggregating `TypedImperativeAggregate` (each task ORs
  * its local bitset; merge is associative), and the batch probes the
  * sketch map-side. Misses are DEFINITELY new (a Bloom filter has no
  * false negatives); only the hit sliver pays the exact join that
  * removes false positives, so exactness is preserved end-to-end while
  * the join input shrinks from |batch| to |dups| + fp·|batch|.
  *
  * The serialized filter is collected to the driver and probed as a
  * BINARY literal: `BloomFilterMightContain` requires a constant (or
  * scalar-subquery) filter side — the same build-then-ship lifecycle
  * Spark's broadcast runtime filters use. Both sides hash through
  * `xxhash64` (seed 42), matching the engine's own runtime-filter
  * hashing.
  */
object Bloom {

  /** Aggregate a (string/binary/long) key column into a serialized
    * Bloom filter of exactly `numBits` bits. */
  def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    Bridge.column(new BloomFilterAggregate(
      Bridge.expressionTree(xxhash64(key)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** True iff `key` MIGHT be in the serialized filter (no false
    * negatives; false-positive rate set by the build's numBits). */
  def mightContain(filter: Array[Byte], key: Column): Column =
    Bridge.column(new BloomFilterMightContain(
      Literal(filter),
      Bridge.expressionTree(xxhash64(key))))

  /** Build the lake-side filter: one distributed pass, `numBits/8`
    * bytes back to the driver. */
  def build(lake: DataFrame, key: Column, expectedItems: Long,
      numBits: Long): Array[Byte] =
    lake.agg(bloomAgg(key, expectedItems, numBits).as("bf"))
      .head().getAs[Array[Byte]](0)

  /** The composed exact gate: per batch row, `is_new` ⇔ its `key` is
    * absent from `lake`'s key set — computed WITHOUT joining the
    * Bloom-miss rows (provably new) and with the lake side of the
    * verify join semi-join-pruned to the hit keys. Output equals the
    * plain anti-join row-for-row (`BloomSpec` forces false positives
    * with an undersized filter and proves it; the registry oracle
    * hash-checks it cross-engine). */
  def newFlags(batch: DataFrame, lake: DataFrame, keyCol: String,
      expectedItems: Long = 1L << 18, numBits: Long = 1L << 21): DataFrame = {
    val spark = batch.sparkSession
    val bf = build(lake, col(keyCol), expectedItems, numBits)
    val probed = batch.withColumn("bloom_hit", mightContain(bf, col(keyCol)))
    val dupKeys = probed.filter(col("bloom_hit"))
      .select(keyCol).distinct()
      .join(lake.select(keyCol).distinct(), Seq(keyCol), "left_semi")
      .withColumn("is_dup", lit(true))
    probed.join(dupKeys, Seq(keyCol), "left")
      .select(probed.columns.filterNot(_ == "bloom_hit").map(col) :+
        coalesce(col("is_dup"), lit(false)).unary_!.as("is_new"): _*)
  }
}
