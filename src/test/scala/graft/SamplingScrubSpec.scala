package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling
import graft.text.TextStats

/** Deterministic hash sampling (layout-independence, cross-table key
  * consistency, rate accuracy) and PII scrubbing. */
class SamplingScrubSpec extends SparkSuite {

  test("hash sample is identical across partitioning layouts") {
    val orders = graft.io.Tables.load(spark, sf("sf0.001"), "orders")
    val a = Sampling.deterministicSample(orders, col("o_orderkey"), 100)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(orders.repartition(17), col("o_orderkey"), 100)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(a == b, "sample membership must not depend on partitioning")
    assert(a.nonEmpty)
  }

  test("sample rate lands near the requested permille") {
    val orders = graft.io.Tables.load(spark, sf("sf0.01"), "orders")
    val total = orders.count().toDouble
    val sampled = Sampling.deterministicSample(orders, col("o_orderkey"), 100).count()
    val rate = sampled / total
    assert(rate > 0.07 && rate < 0.13, s"~10% expected, got $rate")
  }

  test("consistent sampling across tables sharing the key") {
    val orders = graft.io.Tables.load(spark, sf("sf0.001"), "orders")
    val li = graft.io.Tables.load(spark, sf("sf0.001"), "lineitem")
    val sampledOrders = Sampling.deterministicSample(orders, col("o_orderkey"), 100)
      .select(col("o_orderkey"))
    val sampledLi = Sampling.deterministicSample(li, col("l_orderkey"), 100)
    // every sampled lineitem's order is in the sampled orders (same hash
    // on the same key value) — the "sample users, keep their events" law
    val orphans = sampledLi.join(sampledOrders,
      sampledLi("l_orderkey") === sampledOrders("o_orderkey"), "left_anti")
    assert(orphans.count() == 0)
  }

  test("scrub redacts emails, urls, and number runs; piiCount audits them") {
    import spark.implicits._
    val df = Seq(
      ("contact bob@example.com or visit https://ex.com/page?q=1 now", 2),
      ("call +1 (555) 123-4567 today", 1),
      ("clean text with no pii at all", 0)).toDF("text", "expected")
    val out = df.select(TextStats.scrub(col("text")).as("scrubbed"),
        TextStats.piiCount(col("text")).as("n"), col("expected"), col("text"))
      .collect()
    for (r <- out) {
      val scrubbed = r.getAs[String]("scrubbed")
      assert(!scrubbed.contains("@") || scrubbed.contains("<EMAIL>"))
      assert(!scrubbed.contains("http"))
      assert(r.getAs[Int]("n") == r.getAs[Int]("expected"),
        s"piiCount mismatch for '${r.getAs[String]("text")}': $scrubbed")
    }
    val redacted = out.head.getAs[String]("scrubbed")
    assert(redacted.contains("<EMAIL>") && redacted.contains("<URL>"))
    assert(out(1).getAs[String]("scrubbed").contains("<NUMBER>"))
  }
}
