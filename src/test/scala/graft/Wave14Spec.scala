package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.streaming.Events

/** Wave-14 streaming semantics: left-outer stream-stream join and the
  * watermark late-data drop across a checkpoint restart. */
class Wave14Spec extends SparkSuite {

  private val d = sf("sf0.001")

  test("late replay adds exactly nothing: restart output equals the " +
      "recent-only run") {
    val cut = "2024-01-20 00:00:00"
    val without = Events.hourlyWithLateReplay(spark, d, cut,
      replayLate = false).collect()
    val withLate = Events.hourlyWithLateReplay(spark, d, cut).collect()
    assert(without.nonEmpty)
    assert(withLate.map(_.toSeq).toSeq === without.map(_.toSeq).toSeq,
      "months-late history must be dropped by the recovered watermark")
    // and nothing from before the cut may appear
    assert(withLate.forall(_.getString(0) >= "2024-01-20"),
      "no pre-cut window can be emitted")
  }

  test("outer stream join: inner pairs are a subset, lone clicks close " +
      "only after their horizon") {
    val outer = Events.clickErrorPairsOuter(spark, d).collect()
    val inner = Events.clickErrorPairs(spark, d).collect()
    val outerPairs = outer.filter(!_.isNullAt(2)).map(_.toSeq).toSet
    assert(inner.map(_.toSeq).toSet === outerPairs,
      "matched pairs must be exactly the inner join's")
    val lone = outer.filter(_.isNullAt(2))
    assert(lone.nonEmpty, "unmatched clicks must be emitted")
    // final watermark = min(max click, max error) - 1h; every emitted
    // lone click's 10-minute horizon must be strictly below it
    val ev = Tables.load(spark, d, "events")
    def maxMs(t: String): Long = ev.filter(col("event_type") === t)
      .agg(max(unix_micros(col("ts")))).head().getLong(0) / 1000L
    val wm = math.min(maxMs("click"), maxMs("error")) - 3600000L
    // parse "yyyy-MM-dd HH:mm:ss.SSSSSS" exactly (SimpleDateFormat would
    // read the 6 fraction digits as MILLIS — up to ~17 min of skew)
    def toMs(s: String): Long = {
      val base = java.time.LocalDateTime
        .parse(s.substring(0, 19).replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      base + s.substring(20).toLong / 1000L
    }
    lone.foreach { r =>
      val clickMs = toMs(r.getString(1))
      assert(clickMs + 600000L < wm,
        s"click ${r.getString(1)} horizon must be closed by the watermark")
    }
  }
}
