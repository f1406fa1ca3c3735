package graft

import graft.queries.{StreamingQueries, Wave23Queries}

/** Wave-23: transformWithState event-time timers. */
class Wave23Spec extends SparkSuite {

  private val d = sf("sf0.001")

  test("timer-based sessions equal the EventTimeTimeout path row-for-row " +
      "(two engine APIs, one ground truth)") {
    val neu = Wave23Queries.qTwsSessions(spark, d).collect().toSeq
    val old = StreamingQueries.queries("q_stream_sessions")(spark, d)
      .collect().toSeq
    assert(neu.map(_.toSeq) === old.map(_.toSeq))
    assert(neu.nonEmpty)
  }
}
