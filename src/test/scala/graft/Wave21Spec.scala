package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.Wave21Queries

/** Wave-21 operators: transformWithState streaming top-k and the
  * Benford first-digit audit. */
class Wave21Spec extends SparkSuite {

  private val d = sf("sf0.001")

  test("stream top-k: the final per-type leaderboard equals the batch " +
      "recompute — MapState survived the micro-batch boundaries") {
    val got = Wave21Queries.qStreamTopk(spark, d).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(col("cnt").desc, col("user_id"))
    val expect = Tables.load(spark, d, "events")
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .collect()
      .map(r => (r.getString(0), r.getInt(3)) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got === expect)
    assert(got.keys.map(_._1).toSet.size === 5, "all five event types")
  }

  test("benford: shares sum to one, chi2 total matches the cell sum") {
    val rows = Wave21Queries.qBenford(spark, d).collect()
    val (cells, tot) = rows.partition(_.getString(0) != "TOTAL")
    assert(tot.length === 1)
    val shares = cells.map(_.getDouble(2)).sum
    assert(math.abs(shares - 1.0) < 1e-4, s"shares sum $shares")
    val stat = tot.head.getDouble(4)
    val cellSum = cells.map(_.getDouble(4)).sum
    assert(math.abs(stat - cellSum) < 1e-3)
    cells.foreach(r => assert(r.getString(0).matches("[1-9]")))
  }
}
