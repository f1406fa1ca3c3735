package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.Wave13Queries

/** Wave-13 operators: row-level change feed, linear interpolation,
  * last-touch attribution. */
class Wave13Spec extends SparkSuite {

  private val d = sf("sf0.001")

  test("change feed: all four classes present and key conservation holds") {
    val rows = Wave13Queries.qChangeFeed(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet === Set("insert", "update", "delete", "unchanged"))
    val evens = Tables.load(spark, d, "documents")
      .filter(col("doc_id") % 2 === 0).count()
    // v1 keys = evens; every v1 key is updated, deleted, or unchanged
    assert(rows("update") + rows("delete") + rows("unchanged") === evens)
  }

  test("interpolate: known days pass through, gaps sit between their " +
      "neighbors") {
    val rows = Wave13Queries.qInterpolate(spark, d).collect()
    assert(rows.length === 90)
    rows.foreach { r =>
      if (!r.getBoolean(3)) // known day: interpolated == price
        assert(math.abs(r.getDouble(2) - r.getDouble(1)) < 1e-6)
    }
    // every interior gap lies within [min, max] of its known neighbors
    val vals = rows.map(r => (r.getBoolean(3), r.getDouble(2)))
    val known = vals.collect { case (false, v) => v }
    if (known.nonEmpty) {
      val (lo, hi) = (known.min, known.max)
      vals.collect { case (true, v) => v }
        .foreach(v => assert(v >= lo - 1e-6 && v <= hi + 1e-6))
    }
  }

  test("attribution: rates bounded, attributed gaps within the window") {
    val rows = Wave13Queries.qAttribution(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1); val hit = r.getLong(2)
      assert(hit <= n)
      assert(math.abs(r.getDouble(3) - hit.toDouble / n) < 1e-6)
      if (hit > 0) {
        val avgMin = r.getDouble(4)
        assert(avgMin >= 0.0 && avgMin <= 7 * 24 * 60.0,
          s"avg minutes $avgMin must sit inside the 7-day window")
      }
    }
  }
}
