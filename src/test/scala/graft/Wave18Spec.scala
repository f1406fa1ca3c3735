package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.Wave18Queries

/** Wave-18 operators: Markov transitions, exact-k group sampling,
  * label propagation, burst detection. */
class Wave18Spec extends SparkSuite {

  private val d = sf("sf0.001")

  test("markov: transition mass is events minus one per active user; " +
      "rows normalize per from-state") {
    val rows = Wave18Queries.qMarkovTransitions(spark, d).collect()
    val ev = Tables.load(spark, d, "events")
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum === expected)
    rows.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val p = rs.map(_.getDouble(3)).sum
      assert(math.abs(p - 1.0) < 1e-4, s"$from probabilities sum to $p")
    }
  }

  test("group sample: exactly k per source (or the whole group when " +
      "smaller), and the sample is a subset of the group") {
    val rows = Wave18Queries.qGroupSample(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) === math.min(5L, r.getLong(1)),
        s"source ${r.getString(0)}")
    }
  }

  test("label propagation: seeds pinned, every node labeled after 3 " +
      "rounds (nearest seed is <= 2 ring hops away)") {
    val rows = Wave18Queries.qLabelProp(spark, d).collect()
    val docsDf = Tables.load(spark, d, "documents")
    assert(rows.map(_.getLong(1)).sum === docsDf.count())
    assert(!rows.exists(_.getString(0) == "(none)"),
      "ring+chord edges put a seed within 2 hops of every node; 3 " +
        "rounds must label the whole graph")
    // per-label seed counts match the seeding rule exactly
    val seedCounts = docsDf.filter(col("doc_id") % 5 === 0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(2) === seedCounts.getOrElse(r.getString(0), 0L),
        s"label ${r.getString(0)}")
    }
  }

  test("burst detection: z needs 12 history hours; flagged bursts " +
      "really clear the bar") {
    val rows = Wave18Queries.qBurstDetection(spark, d).collect()
    assert(rows.nonEmpty)
    // the first observed hour of each type can have no z
    val firstPerType = rows.groupBy(_.getString(0))
      .map { case (_, rs) => rs.minBy(_.getString(1)) }
    firstPerType.foreach(r => assert(r.isNullAt(3)))
    rows.filter(_.getInt(4) == 1).foreach { r =>
      assert(!r.isNullAt(3) && r.getDouble(3) > 2.5 && r.getLong(2) >= 5)
    }
  }
}
