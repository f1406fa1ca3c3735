package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-statistics data skipping — the Delta/Iceberg mechanic that
  * makes a 100 TB table queryable: each data file carries the true
  * min/max of a sort/cluster column in a stats manifest, and a range
  * probe opens only the files whose [min, max] interval overlaps the
  * predicate. Partition pruning skips DIRECTORIES the partition value
  * rules out; stats skipping additionally skips FILES inside surviving
  * partitions, and works for predicates on columns the layout never
  * partitioned by (as long as the write clustered them).
  *
  * Layout contract (deterministic, so the skip DECISION itself is
  * oracle-replayable): one file per value of an explicit bucket
  * column (repartition on the bucket before a partitionBy write), and
  * the stats are the bucket's true per-file aggregates — tighter than
  * the bucket bounds whenever the data doesn't fill its bucket.
  */
object Skipping {

  private def statsPath(path: String) = new Path(path, "_stats.json")

  /** Bucket values are interpolated into the JSON manifest and matched
    * back by regex — restrict them to a quote/backslash-free charset
    * so the manifest cannot be corrupted (fails loudly at write). */
  private val safeBucket = "^[A-Za-z0-9_\\-.:= ]+$".r

  /** Write `df` as one file per `bucketCol` value and record the true
    * per-file [min, max] of `statsCol` (rendered via CAST AS DATE
    * strings for timestamp columns) into `_stats.json`. Files whose
    * `statsCol` is entirely NULL carry no entry — a range probe can
    * never match their rows, so skipping them is exact. */
  def writeWithStats(df: DataFrame, path: String, bucketCol: String,
      statsCol: String): Unit = {
    val spark = df.sparkSession
    df.repartition(col(bucketCol))
      .write.mode("overwrite").partitionBy(bucketCol).parquet(path)
    val rows = spark.read.parquet(path)
      .groupBy(col(bucketCol).cast("string").as("bucket"))
      .agg(min(col(statsCol)).cast("date").cast("string").as("lo"),
        max(col(statsCol)).cast("date").cast("string").as("hi"))
      .orderBy("bucket")
      .collect()
    rows.foreach { r =>
      require(r.getString(0) != null && safeBucket.matches(r.getString(0)),
        s"bucket value not manifest-safe: '${r.getString(0)}'")
    }
    val stats = rows
      .filter(r => r.getString(1) != null && r.getString(2) != null)
      .map(r => s"""{"bucket":"${r.getString(0)}","lo":"${r.getString(1)}","hi":"${r.getString(2)}"}""")
      .mkString("[", ",", "]")
    val f = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(statsPath(path), true)
    try out.write(stats.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Range probe with stats skipping: returns (pruned frame,
    * n_files_total, n_files_read). Only buckets whose [lo, hi]
    * overlaps [from, to] are listed in the scan (partition-value
    * filter → Spark prunes their directories at listing time); the
    * residual row filter still applies inside surviving files.
    *
    * The stored stats are DATE-granular while `from`/`to` may carry a
    * time component, so the overlap test compares at date granularity
    * (`from.take(10)`): a file whose true max is 1995-03-31 18:00
    * (stat hi = '1995-03-31') must survive a probe from
    * '1995-03-31 10:00:00' — truncating the probe bound widens the
    * keep set, so the test can over-read but never false-prune. */
  def readRange(spark: SparkSession, path: String, bucketCol: String,
      statsCol: String, from: String, to: String): (DataFrame, Long, Long) = {
    require(from.length >= 10 && to.length >= 10 &&
      from.take(10).matches("\\d{4}-\\d{2}-\\d{2}") &&
      to.take(10).matches("\\d{4}-\\d{2}-\\d{2}"),
      s"bounds must start with an ISO date: '$from' .. '$to'")
    val f = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = f.open(statsPath(path))
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val entries = """\{"bucket":"([^"]+)","lo":"([^"]+)","hi":"([^"]+)"\}""".r
      .findAllMatchIn(json)
      .map(m => (m.group(1), m.group(2), m.group(3))).toSeq
    val keep = entries.collect {
      case (b, lo, hi) if lo <= to && hi >= from.take(10) => b
    }
    val df = spark.read.parquet(path)
    val pruned = df
      .filter(col(bucketCol).cast("string").isin(keep: _*))
      .filter(col(statsCol) >= lit(from) && col(statsCol) <= lit(to))
    (pruned, entries.size.toLong, keep.size.toLong)
  }
}
