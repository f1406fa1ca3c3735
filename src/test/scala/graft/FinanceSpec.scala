package graft

import graft.queries.FinanceQueries

class FinanceSpec extends SparkSuite {

  private val d = sf("sf0.001")

  test("drawdown is non-positive and bounded by -100%") {
    val r = FinanceQueries.qDrawdown(spark, d).first()
    val dd = r.getAs[Double]("max_drawdown")
    assert(dd <= 0.0 && dd >= -1.0)
    assert(r.getAs[Double]("equity") <= r.getAs[Double]("peak"))
  }

  test("TWAP lies within the price range; matches plain mean on gapless series") {
    val r = FinanceQueries.qTwap(spark, d).first()
    val twap = r.getAs[Double]("twap")
    val stats = graft.queries.CoreQueries.dailyRevenue(spark, d)
      .agg(org.apache.spark.sql.functions.min("price"),
           org.apache.spark.sql.functions.max("price")).first()
    assert(twap >= stats.getDouble(0) && twap <= stats.getDouble(1))
  }

  test("VWAP per flag lies between min and max unit prices") {
    import org.apache.spark.sql.functions._
    val vwaps = FinanceQueries.qVwap(spark, d).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("vwap")).toMap
    val bounds = graft.io.Tables.load(spark, d, "lineitem")
      .withColumn("unit", col("l_extendedprice"))
      .groupBy("l_returnflag").agg(min("unit"), max("unit"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    vwaps.foreach { case (f, v) =>
      assert(v >= bounds(f)._1 && v <= bounds(f)._2, s"$f vwap $v out of ${bounds(f)}")
    }
  }

  test("rolling volatility is non-negative; histogram covers all return days") {
    import org.apache.spark.sql.functions._
    val vols = FinanceQueries.qRollingVol(spark, d)
      .filter(col("vol30").isNotNull).collect().map(_.getAs[Double]("vol30"))
    assert(vols.nonEmpty && vols.forall(_ >= 0.0))
    val histTotal = FinanceQueries.qReturnHistogram(spark, d)
      .agg(sum("n_days")).first().getLong(0)
    val nRets = graft.queries.CoreQueries.dailyRevenue(spark, d).count() - 1
    assert(histTotal == nRets)
  }
}
