package graft

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.SecondarySort
import graft.streaming.Events

class SecondarySortSpec extends SparkSuite {
  import spark.implicits._

  test("streaming-pass sessionization over sorted groups equals fmgws result") {
    val d = sf("sf0.001")
    val gapMicros = 3600L * 1000000L
    val ev = Tables.load(spark, d, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("t"))

    // O(1)-state pass: emit a session when the gap exceeds the threshold
    val sessions = SecondarySort.processSortedGroups[(Long, Long, Long, Long)](
        ev, "user_id", "t") { (uid, rows) =>
      new Iterator[(Long, Long, Long, Long)] {
        private var pending: Option[(Long, Long, Long)] = None // start,last,n
        private var done = false
        private def emitFrom(): Option[(Long, Long, Long, Long)] = {
          while (rows.hasNext) {
            val t = rows.next().getAs[Long]("t")
            pending match {
              case None => pending = Some((t, t, 1L))
              case Some((s0, l0, n0)) if t - l0 >= gapMicros =>
                pending = Some((t, t, 1L)); return Some((uid, s0, l0, n0))
              case Some((s0, _, n0)) => pending = Some((s0, t, n0 + 1))
            }
          }
          if (!done) { done = true; pending.map { case (s0, l0, n0) => (uid, s0, l0, n0) } }
          else None
        }
        private var nextVal: Option[(Long, Long, Long, Long)] = emitFrom()
        override def hasNext: Boolean = nextVal.isDefined
        override def next(): (Long, Long, Long, Long) = {
          val v = nextVal.get; nextVal = emitFrom(); v
        }
      }
    }.toDF("user_id", "start_us", "end_us", "n_events")
      .select(col("user_id"),
        date_format(timestamp_micros(col("start_us")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(timestamp_micros(col("end_us")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_last_event"),
        col("n_events"))

    val fmgws = Events.fmgwsSessions(spark, d, Tables.load(spark, d, "events"))
    assert(sessions.exceptAll(fmgws).count() == 0)
    assert(fmgws.exceptAll(sessions).count() == 0)
    assert(fmgws.count() > 0)
  }
}
