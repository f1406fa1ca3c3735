package graft

import graft.ops.AsOf

class AsOfSpec extends SparkSuite {
  import spark.implicits._

  private lazy val quotes = Seq(
    ("A", 1, 10.0), ("A", 5, 20.0), ("B", 3, 99.0)
  ).toDF("k", "day", "px")

  private lazy val trades = Seq(
    ("A", 0, 100L), // before any quote -> NULL
    ("A", 1, 101L), // exactly at quote time -> sees it (<= semantics)
    ("A", 4, 102L), // between quotes -> earlier one
    ("A", 9, 103L), // after last -> latest
    ("B", 3, 104L), // tie on other key
    ("B", 2, 105L)  // before key's first quote -> NULL
  ).toDF("k", "day", "id")

  test("as-of join picks most recent quote at or before trade time per key") {
    val got = AsOf.asofJoin(trades, quotes, "day", Seq("k"), Seq("px"))
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (if (r.isNullAt(r.fieldIndex("px"))) None else Some(r.getAs[Double]("px"))))
      .toMap
    assert(got(100L).isEmpty)
    assert(got(101L).contains(10.0))
    assert(got(102L).contains(10.0))
    assert(got(103L).contains(20.0))
    assert(got(104L).contains(99.0))
    assert(got(105L).isEmpty)
    assert(got.size == 6) // exactly one output row per trade
  }
}
