package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.Wave20Queries

/** Wave-20 operators: linear multi-touch attribution and the χ²
  * independence test. */
class Wave20Spec extends SparkSuite {

  private val d = sf("sf0.001")

  test("multi-touch: total credit (channels + unattributed) equals the " +
      "purchase count — credit is conserved") {
    val rows = Wave20Queries.qMultiTouch(spark, d).collect()
    val purchases = Tables.load(spark, d, "events")
      .filter(col("event_type") === "purchase").count()
    val total = rows.map(_.getDouble(1)).sum
    assert(math.abs(total - purchases) < 1e-3,
      s"credit $total vs $purchases purchases")
    assert(rows.exists(r => r.getString(0).startsWith("ch") &&
      r.getDouble(1) > 0), "some channel must earn credit")
  }

  test("chi-square: cell contributions sum to the TOTAL statistic; " +
      "expected preserves the margins") {
    val rows = Wave20Queries.qChiSquare(spark, d).collect()
    val (cells, tot) = rows.partition(_.getString(0) != "TOTAL")
    assert(tot.length === 1)
    val stat = tot.head.getDouble(4)
    val sum = cells.map(_.getDouble(4)).sum
    assert(math.abs(stat - sum) < 1e-3, s"$stat vs cell sum $sum")
    assert(tot.head.getLong(5) === (5L - 1) * (7L - 1), "dof = 24")
    // expected-count margins match observed margins per event type
    cells.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val obs = rs.map(_.getLong(2)).sum.toDouble
      val exp = rs.map(_.getDouble(3)).sum
      assert(math.abs(obs - exp) < 1e-3)
    }
  }
}
