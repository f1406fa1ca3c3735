package graft

import org.apache.spark.sql.execution.ExplainMode

/** Column profiler ([[graft.ops.Profile]]).
  *
  * Pins the r16 plan-shape change: the distinct counts and the basic
  * stats run as SEPARATE aggregation passes (mixed countDistinct +
  * min/max-string in one agg plans a 7-way Expand through a 19-function
  * SortAggregate — two full sorts of the expanded frame), while the
  * OUTPUT stays exactly the per-column (n, nulls, distinct, min, max)
  * long-form profile.
  */
class ProfileSpec extends SparkSuite {

  private lazy val df = {
    import spark.implicits._
    Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "a", 1.5), (2L, "b", null), (2L, null, 2.5),
      (3L, "a", 2.5), (null, "c", 0.25))
      .toDF("k", "s", "v")
  }

  test("exact counts, nulls, distincts and rendered min/max per column") {
    val got = graft.ops.Profile.profile(df, Seq("k", "s", "v"))
      .orderBy("col_name")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(got.toSeq == Seq(
      ("k", 5L, 1L, 3L, "1", "3"),
      ("s", 5L, 1L, 3L, "a", "c"),
      ("v", 5L, 1L, 3L, "0.2500", "2.5000")))
  }

  test("distinct pass never rides a SortAggregate (the Expand stays " +
      "payload-free and hash-aggregable)") {
    val plan = graft.ops.Profile.profile(df, Seq("k", "s", "v"))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the Expand (countDistinct dedup) subtree must be HashAggregate;
    // SortAggregate appears only in the basic-stats pass, which has NO
    // grouping keys and therefore no sort of a data-sized frame
    val expandIdx = plan.indexOf("Expand")
    assert(expandIdx >= 0, "countDistinct still plans through Expand")
    assert(plan.contains("HashAggregate"),
      "distinct dedup must be hash-aggregable:\n" + plan.take(800))
    assert(!plan.contains("Sort ("),
      "no sort of the expanded frame may remain:\n" + plan.take(800))
  }
}
