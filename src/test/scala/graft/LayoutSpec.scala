package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode
import graft.io.Tables
import graft.ops.Scale

/** Physical-layout behaviors that matter at 100 TB: partition pruning,
  * shuffle-free bucketed joins, salted-aggregation equivalence. Asserts
  * on the PLAN (formatted explain), not just results. */
class LayoutSpec extends SparkSuite {

  private val d = sf("sf0.001")

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("partitioned write + year predicate prunes partitions at scan") {
    val dir = Files.createTempDirectory("part").toString + "/lineitem_by_year"
    val li = Tables.load(spark, d, "lineitem")
      .withColumn("ship_year", year(col("l_shipdate")))
    Scale.writePartitioned(li, dir, "ship_year")

    val q = spark.read.parquet(dir)
      .filter(col("ship_year") === 1996)
      .agg(sum(col("l_quantity")))
    val plan = planOf(q)
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("ship_year"), plan)
    // correctness: equals unpartitioned filter
    val expected = Tables.load(spark, d, "lineitem")
      .filter(year(col("l_shipdate")) === 1996)
      .agg(sum(col("l_quantity"))).first().getDouble(0)
    assert(q.first().getDouble(0) == expected)
  }

  test("identically bucketed tables join without a shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      Scale.writeBucketed(Tables.load(spark, d, "orders"), "orders_b", 4, "o_custkey")
      Scale.writeBucketed(Tables.load(spark, d, "customer"), "customer_b", 4, "c_custkey")
      val j = spark.table("orders_b").join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
      val plan = planOf(j)
      // bucketed SMJ: no Exchange feeding the join
      assert(!plan.contains("Exchange"), plan)
      assert(j.count() ==
        Tables.load(spark, d, "orders").join(Tables.load(spark, d, "customer"),
          col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("salted aggregation equals direct aggregation exactly") {
    val li = Tables.load(spark, d, "lineitem")
    val salted = Scale.saltedSum(li, "l_returnflag", "l_extendedprice", salts = 8)
      .orderBy("l_returnflag").collect()
    val direct = li.groupBy("l_returnflag")
      .agg(graft.queries.Q.dsum(col("l_extendedprice")).as("total"),
           count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect()
    assert(salted.length == direct.length)
    salted.zip(direct).foreach { case (s, dr) =>
      assert(s.getString(0) == dr.getString(0))
      assert(s.getAs[Double]("total") == dr.getAs[Double]("total")) // bit-equal
      assert(s.getAs[Long]("n") == dr.getAs[Long]("n"))
    }
  }
}
