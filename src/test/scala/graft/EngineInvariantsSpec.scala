package graft

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.multimodal.Multimodal
import graft.queries.{AnalyticQueries, RelationalQueries, StreamingQueries}
import graft.streaming.Events

/** Cross-operator invariants on real test data (sf0.001) — cheap checks
  * that hold at any scale factor. */
class EngineInvariantsSpec extends SparkSuite {

  private val d = sf("sf0.001")

  test("semi + anti join partition the customer table") {
    val all = Tables.load(spark, d, "customer").count()
    val withOrders = Tables.load(spark, d, "customer")
      .join(Tables.load(spark, d, "orders"),
        col("c_custkey") === col("o_custkey"), "left_semi").count()
    val without = RelationalQueries.qAntiJoin(spark, d).count()
    assert(withOrders + without == all)
  }

  test("rollup grand total equals table count") {
    val r = RelationalQueries.qRollup(spark, d)
      .filter(col("returnflag") === "ALL" && col("linestatus") === "ALL")
      .collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n") == Tables.load(spark, d, "lineitem").count())
  }

  test("cube contains marginals consistent with grand total") {
    val cube = RelationalQueries.qCube(spark, d).collect()
    val grand = cube.find(r => r.getString(0) == "ALL" && r.getString(1) == "ALL").get
    val statusMarginals = cube.filter(r => r.getString(0) != "ALL" && r.getString(1) == "ALL")
    assert(statusMarginals.map(_.getAs[Long]("n")).sum == grand.getAs[Long]("n"))
  }

  test("top-k equals sort-then-head") {
    val topk = RelationalQueries.qTopCustomers(spark, d)
      .collect().map(_.getAs[Long]("o_custkey"))
    val sorted = Tables.load(spark, d, "orders")
      .groupBy("o_custkey")
      .agg(graft.queries.Q.dsum(col("o_totalprice")).as("spend"))
      .orderBy(col("spend").desc, col("o_custkey"))
      .limit(10).collect().map(_.getAs[Long]("o_custkey"))
    assert(topk.toSeq == sorted.toSeq)
  }

  test("streaming tumbling result equals batch groupBy on bounded input") {
    val stream = Events.hourlyByType(spark, d)
    val batch = AnalyticQueries.qEventsHourly(spark, d)
      .withColumnRenamed("hour", "hour")
    val sDiff = stream.exceptAll(batch).count()
    val bDiff = batch.exceptAll(stream).count()
    assert(sDiff == 0 && bDiff == 0)
  }

  test("sliding windows double-count each event exactly twice") {
    val n = Tables.load(spark, d, "events").count()
    val windowed = StreamingQueries.qSlidingWindows(spark, d)
      .agg(sum(col("n"))).first().getLong(0)
    assert(windowed == 2 * n)
  }

  test("session windows cover all events exactly once") {
    val n = Tables.load(spark, d, "events").count()
    val sessions = StreamingQueries.qSessionWindows(spark, d)
      .agg(sum(col("n_events"))).first().getLong(0)
    assert(sessions == n)
  }

  test("multimodal feature extraction is deterministic and total") {
    val media = Multimodal.fromDocuments(Tables.load(spark, d, "documents"))
    val f1 = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    val f2 = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    assert(f1 == f2)
    assert(f1.size == media.count())
    assert(f1.values.forall(_.length == 8))
    // text payloads are not decodable images → all rows flagged fallback
    val decoded = Multimodal.extractFeatures(media)
      .filter(col("is_decoded")).count()
    assert(decoded == 0)
  }

  test("frame sampling emits n rows per media (fallback path on text payloads)") {
    val media = Multimodal.fromDocuments(Tables.load(spark, d, "documents"))
    val frames = Multimodal.sampleFrames(media, nFrames = 4)
    assert(frames.count() == 4 * media.count())
    val byMedia = frames.groupBy("media_id").count().select("count").distinct().collect()
    assert(byMedia.length == 1 && byMedia.head.getLong(0) == 4)
    assert(frames.filter(col("is_decoded")).count() == 0)
  }

  test("byteFoldFeatures (non-image fallback) folds bytes deterministically") {
    val a = Multimodal.byteFoldFeatures("hello world".getBytes, 4)
    val b = Multimodal.byteFoldFeatures("hello world".getBytes, 4)
    assert(a.toSeq == b.toSeq)
    assert(a.sum > 0f)
  }
}
