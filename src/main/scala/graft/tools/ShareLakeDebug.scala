package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: why does the wave-72 lake star's Aggregate lack a CBO
  * rowCount while its share join still broadcasts? Prints per-node
  * stats of the optimized plan. */
object ShareLakeDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "8192")
    val byNation = graft.queries.Wave72Queries.qTpcdsShareLakeDebugStar(spark, d)
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"))
    val byRegion = byNation.groupBy(col("r_name"))
      .agg(sum(col("n_orders")).as("x"))
    val j = byNation.join(byRegion, "r_name")
    val op = j.queryExecution.optimizedPlan
    op.foreach { n =>
      val st = n.stats
      println(s"${n.nodeName}: rows=${st.rowCount} size=${st.sizeInBytes} " +
        s"attrs=${st.attributeStats.map { case (a, s) =>
          s"${a.name}(ndv=${s.distinctCount},nulls=${s.nullCount})"
        }.mkString(";")}")
    }
    spark.stop()
  }
}
