package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale infrastructure: the techniques that keep plans healthy at
  * 100 TB — partitioned layout (partition pruning), bucketed layout
  * (shuffle-free joins), and key salting (skew mitigation). Exercised by
  * `LayoutSpec`; the query registry runs on the driver's flat parquet, so
  * these are library operators + tests rather than registry entries.
  */
object Scale {

  /** Write a frame Hive-partitioned by the given columns — scans with
    * predicates on those columns prune at file-listing time (plan shows
    * PartitionFilters, not data filters). */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Write a bucketed + sorted table into the session catalog. Two tables
    * bucketed identically on the join key join WITHOUT a shuffle
    * (SortMergeJoin with no Exchange). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCol: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Salted high-cardinality aggregation: pre-aggregate on (key, salt),
    * then combine per key. Two shuffles, but the first spreads a hot key
    * across `salts` reducers — the classic skew fix when one key holds a
    * disproportionate share of rows. Result is identical to a direct
    * groupBy-sum (addition is associative; use decimal-exact sums for
    * bit-stability). */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                salts: Int): DataFrame = {
    import graft.queries.Q
    df.withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(Q.dsum(col(valueCol)).as("_partial"), count(lit(1)).as("_n"))
      .groupBy(col(key))
      .agg(sum(col("_partial").cast(org.apache.spark.sql.types.DecimalType(38, 8)))
             .cast("double").as("total"),
           sum(col("_n")).as("n"))
  }

  /** Broadcast-join a skewed fact to a dimension after salting the
    * replicated dim — included for API completeness; with AQE's skew-join
    * handling (`spark.sql.adaptive.skewJoin.enabled`, on by default) this
    * manual path is only needed for extreme single-key skew. */
  def aqeSkewHints(spark: SparkSession): Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> spark.conf.get("spark.sql.adaptive.enabled"),
    "spark.sql.adaptive.skewJoin.enabled" ->
      spark.conf.get("spark.sql.adaptive.skewJoin.enabled"))
}
