package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Receipt tool for the q_sql_optimize_cluster z-order pruning
  * failure at sf0.001: lays out the same fixture, prints each file's
  * raw (k, c) extrema and the z-rank distribution, so the layout
  * geometry is visible instead of inferred.
  * Usage: runMain graft.tools.ZOrderDebug <sfDir>
  */
object ZOrderDebug {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.io.Tables.load(spark, d, "orders")
      .select(col("o_orderkey").as("k"), col("o_custkey").as("c"),
        col("o_totalprice").as("p"))
    println(s"rows=${base.count()}  k=[${base.agg(min("k"), max("k")).head()}]" +
      s"  c=[${base.agg(min("c"), max("c")).head()}]")
    val laid = graft.ops.ZOrder.layout(base.repartition(8), 8, Seq("k", "c"))
    val perFile = laid
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(count(lit(1)).as("n"), min("k").as("k_min"), max("k").as("k_max"),
        min("c").as("c_min"), max("c").as("c_max"))
      .orderBy("pid")
    perFile.collect().foreach { r =>
      val hit = r.getAs[Long]("k_min") <= 1000 && r.getAs[Long]("k_max") >= 1
      println(f"pid=${r.getInt(0)}%2d n=${r.getLong(1)}%5d " +
        f"k=[${r.getAs[Long]("k_min")}%6d,${r.getAs[Long]("k_max")}%6d] " +
        f"c=[${r.getAs[Long]("c_min")}%4d,${r.getAs[Long]("c_max")}%4d] " +
        s"kProbeHit=$hit")
    }
    spark.stop()
  }
}
