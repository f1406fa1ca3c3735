package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.Wave15Queries

/** Wave-15 operators: temporal dimension join and timed funnel. */
class Wave15Spec extends SparkSuite {

  private val d = sf("sf0.001")

  test("temporal join: every event lands in exactly one priority bucket") {
    val rows = Wave15Queries.qTemporalJoin(spark, d).collect()
    val ev = Tables.load(spark, d, "events")
    assert(rows.map(_.getLong(1)).sum === ev.count(),
      "event mass must be partitioned by the as-of priority")
    val users = rows.map(_.getLong(2)).sum
    // a user can appear under several priorities over time, so the
    // bucketed user counts bound the distinct total from above
    val distinctUsers = ev.select("user_id").distinct().count()
    assert(users >= distinctUsers)
    // users with order history must dominate 'none' at this SF
    assert(rows.exists(r => r.getString(0) != "none" && r.getLong(1) > 0))
  }

  test("temporal join: a mid-history event takes the version valid at " +
      "its time, not the latest") {
    import spark.implicits._
    // synthetic: one customer, two versions (P1 from day 1, P2 from
    // day 10); an event on day 5 must see P1
    val hist = Seq(
      (1L, java.sql.Date.valueOf("2020-01-01"), 0, 1L, "P1"),
      (1L, java.sql.Date.valueOf("2020-01-10"), 0, 2L, "P2"),
      (1L, java.sql.Date.valueOf("2020-01-05"), 1, 0L, null.asInstanceOf[String]))
      .toDF("custkey", "day", "tag", "version", "priority")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("custkey")
      .orderBy(col("day"), col("tag"), col("version"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val got = hist.withColumn("pr",
        last(when(col("tag") === 0, col("priority")), ignoreNulls = true)
          .over(w))
      .filter(col("tag") === 1).select("pr").head().getString(0)
    assert(got === "P1", "day-5 event must see the day-1 version")
  }

  test("funnel steps: monotone counts and consistent rates") {
    val r = Wave15Queries.qFunnelSteps(spark, d).collect().head
    val (n0, n1, n2) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n0 >= n1 && n1 >= n2, s"funnel must narrow: $n0 >= $n1 >= $n2")
    assert(n0 > 0)
    assert(math.abs(r.getDouble(3) - n1.toDouble / n0) < 1e-6)
    if (n1 > 0)
      assert(math.abs(r.getDouble(4) - n2.toDouble / n1) < 1e-6)
  }
}
