package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Distributed-filesystem operations via the Hadoop `FileSystem` API —
  * replacing the reference's `hdfs dfs` SUBPROCESS calls
  * (ref `controller/app.py:720-804`: `-test -e`, `-mkdir -p`, `-put -f`,
  * `-get`, `-rm -r`) and its glob+move part-file flattening
  * (ref `controller/app.py:431-503`). Same semantics, no process
  * boundary, and it works uniformly for hdfs://, s3a://, file:// —
  * whatever the cluster's defaultFS is.
  */
object Dfs {

  def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** `hdfs dfs -test -e` (ref `controller/app.py:720-738`). */
  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(path))

  /** `hdfs dfs -mkdir -p` (ref `controller/app.py:740-757`). */
  def mkdirs(spark: SparkSession, path: String): Boolean =
    fs(spark, path).mkdirs(new Path(path))

  /** Idempotent `-put -f` with parent creation (ref
    * `controller/app.py:759-804`). */
  def put(spark: SparkSession, local: String, dest: String): Unit = {
    val f = fs(spark, dest)
    val d = new Path(dest)
    Option(d.getParent).foreach(f.mkdirs)
    f.copyFromLocalFile(false, true, new Path(local), d)
  }

  /** `-get` (ref `controller/app.py:360-400`). */
  def get(spark: SparkSession, remote: String, local: String): Unit =
    fs(spark, remote).copyToLocalFile(new Path(remote), new Path(local))

  /** `-rm -r` (ref `controller/app.py:402-429`). */
  def deleteRecursive(spark: SparkSession, path: String): Boolean =
    fs(spark, path).delete(new Path(path), true)

  /** Part-file flattening (ref `controller/app.py:457-503`): a
    * coalesce(1) CSV sink directory holds exactly one `part-*.csv`;
    * move it to `destFile` and remove the directory. Errors on ≠1 part
    * file, matching the reference's contract
    * (ref `controller/app.py:479-480`). */
  def flattenSinglePart(spark: SparkSession, sinkDir: String,
                        destFile: String): Unit = {
    val f = fs(spark, sinkDir)
    val parts = f.globStatus(new Path(sinkDir, "part-*"))
    require(parts != null && parts.length == 1,
      s"expected exactly one part file in $sinkDir, found ${if (parts == null) 0 else parts.length}")
    val dest = new Path(destFile)
    Option(dest.getParent).foreach(f.mkdirs)
    require(f.rename(parts.head.getPath, dest), s"rename to $destFile failed")
    f.delete(new Path(sinkDir), true)
  }
}
