package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Input row: one event's (user, event time). The watermarked ts
  * ATTRIBUTE itself must reach the operator (a derived micros column
  * would drop the watermark metadata the timer checker needs — the
  * Events.sessionize lesson). */
case class SessIn(user_id: Long, ts: java.sql.Timestamp)

/** One closed session. */
case class SessOut(user_id: Long, start_us: Long, end_us: Long,
    n_events: Long)

/** Gap sessionization on `transformWithState` with EVENT-TIME TIMERS —
  * the new-API twin of `Events.sessionize`'s
  * flatMapGroupsWithState(EventTimeTimeout) path, with the same
  * semantics: state holds only each user's OPEN session (3 longs); a
  * later event beyond the gap closes and emits it; otherwise ONE
  * registered event-time timer at (last + gap) fires when the
  * watermark proves no event can extend the session, emits it, and
  * clears state. Timers are explicitly re-registered per update (the
  * API accumulates timers; the previous one must be deleted — the
  * part EventTimeTimeout's single implicit timeout hid). Sessions
  * still open at end-of-stream stay in state, exactly like the old
  * path, so both APIs satisfy the same replay oracle. */
class StatefulSessions(gapMicros: Long)
    extends StatefulProcessor[Long, SessIn, SessOut] {

  @transient private var sess: org.apache.spark.sql.streaming.ValueState[(Long, Long, Long)] = _
  @transient private var tmr: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    sess = getHandle.getValueState[(Long, Long, Long)]("sess",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong), TTLConfig.NONE)
    tmr = getHandle.getValueState[Long]("tmr",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  private def rearm(lastUs: Long): Unit = {
    // CEIL to millis: a floored expiry can fire up to 999 µs before
    // last + gap, prematurely closing a session that a
    // sub-millisecond-late event should still extend (the batch
    // oracle's island split is full-microsecond)
    val expiry = (lastUs + gapMicros + 999L) / 1000L
    if (tmr.exists()) {
      if (tmr.get() != expiry) {
        getHandle.deleteTimer(tmr.get())
        getHandle.registerTimer(expiry)
        tmr.update(expiry)
      }
    } else {
      getHandle.registerTimer(expiry)
      tmr.update(expiry)
    }
  }

  override def handleInputRows(uid: Long, rows: Iterator[SessIn],
      timers: TimerValues): Iterator[SessOut] = {
    val ts = rows.map(r =>
      r.ts.getTime * 1000L + (r.ts.getNanos / 1000L) % 1000L)
      .toArray.sorted
    val out = scala.collection.mutable.ArrayBuffer.empty[SessOut]
    var cur: Option[(Long, Long, Long)] =
      if (sess.exists()) Some(sess.get()) else None
    ts.foreach { t =>
      cur match {
        case Some((st, last, n)) if t - last >= gapMicros =>
          out += SessOut(uid, st, last, n); cur = Some((t, t, 1L))
        case Some((st, last, n)) =>
          // batch-internal order is sorted, but a legal late event from
          // a later batch may precede state.last — envelope min/max
          cur = Some((math.min(st, t), math.max(last, t), n + 1))
        case None =>
          cur = Some((t, t, 1L))
      }
    }
    cur.foreach { c => sess.update(c); rearm(c._2) }
    out.iterator
  }

  override def handleExpiredTimer(uid: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[SessOut] = {
    // a stale timer can fire if the session advanced in the same batch
    // boundary — only emit when THIS expiry is the armed one
    if (sess.exists() && tmr.exists() &&
        tmr.get() == expired.getExpiryTimeInMs) {
      val (st, last, n) = sess.get()
      sess.clear(); tmr.clear()
      Iterator.single(SessOut(uid, st, last, n))
    } else Iterator.empty
  }
}
