package graft

import org.apache.spark.sql.functions._
import graft.io.{Tables, Typed}

class TypedSpec extends SparkSuite {
  import spark.implicits._

  private val d = sf("sf0.001")

  test("typed views load with compile-checked fields") {
    val li = Typed.lineitem(spark, d)
    assert(li.head().l_orderkey >= 0L)
    assert(Typed.orders(spark, d).count() ==
      Tables.load(spark, d, "orders").count())
    assert(Typed.embeddings(spark, d).head().embedding.length == 64)
  }

  test("typed filter + groupByKey agg matches untyped") {
    val typed = Typed.lineitem(spark, d)
      .filter(_.l_quantity > 10.0)
      .groupByKey(_.l_returnflag)
      .agg(sum($"l_quantity").as[Double])
      .collect().toMap
    val untyped = Tables.load(spark, d, "lineitem")
      .filter(col("l_quantity") > 10.0)
      .groupBy("l_returnflag").agg(sum(col("l_quantity")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(typed == untyped)
  }

  test("typed joinWith yields pair dataset") {
    val pairs = Typed.orders(spark, d)
      .joinWith(Typed.customers(spark, d),
        $"o_custkey" === $"c_custkey", "inner")
    val p = pairs.head()
    assert(p._1.o_custkey == p._2.c_custkey)
    assert(pairs.count() == Tables.load(spark, d, "orders").count())
  }

  test("typed column filter still pushes down to the parquet scan") {
    val q = Typed.lineitem(spark, d).filter($"l_quantity" > 45.0)
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(l_quantity,45.0)"), plan)
  }
}
