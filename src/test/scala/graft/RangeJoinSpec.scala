package graft

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSuite {

  private val d = sf("sf0.001")

  test("bucketized interval join equals naive inequality join") {
    val ev = Tables.load(spark, d, "events")
    val l = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val r = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("v_ts"), col("event_id").as("v_id"))

    val bucketized = RangeJoin.intervalJoin(l, r, "ts", "v_ts", -600L, 0L, Seq("user_id"))
      .select("event_id", "v_id")
    val naive = l.join(r, Seq("user_id"))
      .filter(col("v_ts") >= col("ts") - expr("INTERVAL 600 SECONDS") &&
              col("v_ts") < col("ts"))
      .select("event_id", "v_id")
    assert(bucketized.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(bucketized).count() == 0)
    assert(bucketized.count() == bucketized.distinct().count()) // no dup pairs
  }

  test("boundary rows: window exactly on bucket edges") {
    import spark.implicits._
    val l = Seq((1L, java.time.LocalDateTime.parse("2024-01-01T01:00:00")))
      .toDF("id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val r = Seq(
      (10L, "2024-01-01T00:50:00"), // == lower bound, inclusive
      (11L, "2024-01-01T00:49:59.999999"), // just below -> excluded
      (12L, "2024-01-01T00:59:59.999999"), // just inside
      (13L, "2024-01-01T01:00:00")  // == upper bound, exclusive
    ).toDF("rid", "s")
      .withColumn("v_ts", col("s").cast("timestamp")).drop("s")
      .withColumn("k", lit(1))
    val lk = l.withColumn("k", lit(1))
    val got = RangeJoin.intervalJoin(lk, r, "ts", "v_ts", -600L, 0L, Seq("k"))
      .select("rid").collect().map(_.getLong(0)).toSet
    assert(got == Set(10L, 12L))
  }
}
