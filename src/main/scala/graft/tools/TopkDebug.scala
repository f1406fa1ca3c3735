package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: where does q_tpcds_topk_rollup's 2x-over-rollup go? */
object TopkDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$tag run$i rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    time("rollup")(graft.queries.Wave71Queries.qTpcdsRollup(spark, d).count())
    time("topk")(graft.queries.Wave71Queries.qTpcdsTopkRollup(spark, d).count())
    // the rollup+dsum aggregate alone (the topk's upstream), no window
    import graft.queries.Q
    val li = graft.io.Tables.load(spark, d, "lineitem")
    val o = graft.io.Tables.load(spark, d, "orders")
    val c = graft.io.Tables.load(spark, d, "customer")
    val n = graft.io.Tables.load(spark, d, "nation")
    val r = graft.io.Tables.load(spark, d, "region")
    val star = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
    val lv = star.rollup(col("r_name"), col("n_name"))
      .agg(grouping_id().cast("long").as("gid"),
        Q.dsum(expr("l_extendedprice * (1 - l_discount)")).as("revenue"))
    time("lv_only")(lv.count())
    val sel = lv.select(col("gid"),
      coalesce(col("r_name"), lit("ALL")).as("region"),
      coalesce(col("n_name"), lit("ALL")).as("nation"),
      col("revenue"))
    time("lv_select")(sel.count())
    val w = org.apache.spark.sql.expressions.Window.partitionBy("gid")
      .orderBy(col("revenue").desc, col("region"), col("nation"))
    val ranked = sel.withColumn("rk", row_number().over(w))
    time("ranked")(ranked.count())
    time("ranked_filter")(ranked.filter(col("rk") <= 3).count())
    spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "-1")
    time("ranked_filter_noWGL")(ranked.filter(col("rk") <= 3).count())
    spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "1000")
    // collect instead of count (the registry/bench shape)
    time("topk_collect")(
      graft.queries.Wave71Queries.qTpcdsTopkRollup(spark, d)
        .collect().length.toLong)
    spark.stop()
  }
}
