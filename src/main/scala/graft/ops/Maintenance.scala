package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table-maintenance operators for long-lived parquet datasets — the
  * operational half of a training-data pipeline at 100 TB:
  *
  *  - '''partition upsert''': rewrite only the Hive partitions present
  *    in the incoming batch (dynamic partition overwrite) — incremental
  *    backfills touch days, not the table.
  *  - '''compaction''': rewrite a directory into ~target-sized files.
  *    Streaming sinks and partition upserts accrete small files; scan
  *    cost at scale is dominated by file-open overhead once files drop
  *    well below the rowgroup/split size.
  */
object Maintenance {

  /** Overwrite only the partitions present in `batch` (others retained).
    * Uses Spark's dynamic partitionOverwriteMode, scoped to this write. */
  def upsertPartitions(batch: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try batch.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Rewrite `path` into ⌈bytes / targetBytes⌉ files (atomic-ish: write
    * to a sibling temp dir, then swap via rename). Returns the new file
    * count. */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(new Path(path)).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = new Path(path + "_compacting")
    val bak = new Path(path + "_precompact")
    spark.read.parquet(path).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    require(fs.rename(new Path(path), bak), s"backup rename failed for $path")
    require(fs.rename(tmp, new Path(path)), s"swap rename failed for $path")
    fs.delete(bak, true)
    nFiles
  }
}
