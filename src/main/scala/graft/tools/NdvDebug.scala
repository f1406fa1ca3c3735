package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.Versioned

/** Scratch: inspect what the planner sees from manifest NDV. */
object NdvDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val work = java.nio.file.Files.createTempDirectory("graft_ndvdbg")
    val dir = work.resolve("a").toString
    val data = Tables.load(spark, "/root/testdata/sf0.01", "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"),
        (col("o_orderkey") % 5).as("g"))
    Versioned.init(data.repartition(4), dir, statsCols = Seq("g"))
    // 1. are sketches in the manifest?
    val entries = Versioned.manifestEntries(spark, dir, 1L)
    println(s"ENTRIES=${entries.size}")
    entries.take(2).foreach { case (f, sj) =>
      println(s"STATS ${sj.map(_.take(300))}")
    }
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "8192")
    val t = spark.read.format("graft-lake").option("path", dir).load()
    val rel = t.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r
    }
    rel.foreach { r =>
      println(s"SCANSTATS rows=${r.stats.rowCount} size=${r.stats.sizeInBytes}")
      println(s"ATTRSTATS ${r.stats.attributeStats.map { case (a, cs) =>
        s"${a.name}: ndv=${cs.distinctCount}" }.mkString(", ")}")
    }
    val agg = t.groupBy("g").agg(count(lit(1)).as("n_g"))
    val aggNode = agg.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    aggNode.foreach(a => println(
      s"AGGSTATS rows=${a.stats.rowCount} size=${a.stats.sizeInBytes}"))
    val j = t.join(agg, "g")
    println(j.queryExecution.executedPlan.toString.take(600))
    val p = new org.apache.hadoop.fs.Path(work.toString)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
    spark.stop()
  }
}
