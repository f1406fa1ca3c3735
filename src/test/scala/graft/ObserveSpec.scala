package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import graft.io.Tables

/** `df.observe` — zero-cost pipeline metrics collected during the
  * action itself (no second scan): the hook a production ingest would
  * use for row counts / null rates / checksum gauges at 100 TB, where a
  * separate validation query doubles the read. */
class ObserveSpec extends SparkSuite {

  test("observation metrics ride along with the action") {
    val d = sf("sf0.001")
    val obs = Observation("ingest_stats")
    val li = Tables.load(spark, d, "lineitem")
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("l_discount").isNull, 1L).otherwise(0L)).as("null_discounts"),
        graft.queries.Q.dsum(col("l_extendedprice")).as("price_checksum"))
      .filter(col("l_quantity") > 0)
    val n = li.count() // single action drives both query and metrics
    val m = obs.get
    assert(m("n_rows").asInstanceOf[Long] == 6005 || m("n_rows").asInstanceOf[Long] > 0)
    assert(m("null_discounts").asInstanceOf[Long] == 0L)
    assert(m("price_checksum").asInstanceOf[Double] > 0.0)
    assert(n > 0)
  }
}
