package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.Wave17Queries

/** Wave-17 operators: triangle census, incremental aggregate
  * maintenance, DSIR selection, entity resolution, TPC-H Q18/Q13. */
class Wave17Spec extends SparkSuite {

  private val d = sf("sf0.001")

  test("triangle census: K4 has exactly 4 triangles, clustering 1") {
    import spark.implicits._
    // complete graph on {0,1,2,3}: C(4,3)=4 triangles, 12 wedges
    val edges = (for { a <- 0L to 3L; b <- 0L to 3L if a < b }
      yield (a, b)).toDF("a", "b")
    val r = Wave17Queries.triangleCensus(edges).head()
    assert(r.getLong(0) === 4L, "nodes")
    assert(r.getLong(1) === 6L, "edges")
    assert(r.getLong(2) === 12L, "wedges")
    assert(r.getLong(3) === 4L, "triangles")
    assert(r.getDouble(4) === 1.0, "clustering")
  }

  test("triangle census: duplicate/reversed edges collapse; a path has none") {
    import spark.implicits._
    // path 0-1-2 given as duplicated + reversed directed edges
    val edges = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L), (1L, 2L))
      .toDF("a", "b")
    val r = Wave17Queries.triangleCensus(edges).head()
    assert(r.getLong(1) === 2L, "edges deduped")
    assert(r.getLong(2) === 1L, "one wedge at the middle vertex")
    assert(r.getLong(3) === 0L, "no triangle on a path")
  }

  test("q_triangles: the planted ring triangles are all found") {
    val n = Tables.load(spark, d, "documents").count()
    val r = Wave17Queries.qTriangles(spark, d).head()
    // each i plants (i, i+1, i+2); long-range links only add closures
    assert(r.getLong(3) >= n, s"expected >= $n planted triangles, got ${r.getLong(3)}")
    assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
  }

  test("incremental aggregate maintenance equals the full recompute " +
      "for every source, and the deltas are non-trivial") {
    val rows = Wave17Queries.qIncrAgg(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(7) === 1, s"docs_ok failed for ${r.getString(0)}")
      assert(r.getInt(8) === 1, s"sum_ok failed for ${r.getString(0)}")
    }
    assert(rows.exists(_.getLong(3) != 0L), "some doc-count delta must be nonzero")
    assert(rows.exists(_.getLong(4) != 0L), "some sum delta must be nonzero")
  }

  test("DSIR calibrated selection separates the target language on the " +
      "held-out split") {
    val rows = Wave17Queries.qDsirWeights(spark, d).collect()
      .map(r => r.getString(0) -> r).toMap
    val en = rows("en")
    assert(en.getDouble(3) >= 0.9, s"en selection rate ${en.getDouble(3)}")
    (rows - "en").values.foreach { r =>
      assert(r.getDouble(3) <= 0.1,
        s"${r.getString(0)} selection rate ${r.getDouble(3)}")
      assert(en.getDouble(4) > r.getDouble(4),
        "en mean score must dominate every other language")
    }
  }

  test("entity match: every entity produces a candidate; resolution is " +
      "mostly correct and counts are consistent") {
    val r = Wave17Queries.qEntityMatch(spark, d).head()
    val (n, matched, correct, wrong) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n === Tables.load(spark, d, "documents").count())
    assert(matched === n, "every dirty record is within distance 1 of " +
      "its origin, so the <=2 gate cannot drop it")
    assert(correct + wrong === matched)
    assert(r.getDouble(4) >= 0.85, s"recall ${r.getDouble(4)}")
    assert(r.getDouble(5) >= 0.85, s"precision ${r.getDouble(5)}")
  }

  test("tpch q18: every returned order really exceeds the quantity bar") {
    val rows = Wave17Queries.qTpchQ18(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(5) > 300.0))
    // the order ledger agrees with a direct recompute per order
    val direct = Tables.load(spark, d, "lineitem")
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      .filter(col("q") > 300).count()
    assert(rows.length === direct.toInt.min(100))
  }

  test("tpch q13: the distribution accounts for every customer exactly once") {
    val rows = Wave17Queries.qTpchQ13(spark, d).collect()
    val nCust = Tables.load(spark, d, "customer").count()
    assert(rows.map(_.getLong(1)).sum === nCust)
    // the zero bucket (if present) equals the anti-join recompute of
    // customers with no qualifying order — the left join's null path
    val noOrder = Tables.load(spark, d, "customer")
      .join(Tables.load(spark, d, "orders")
          .filter(col("o_orderpriority") =!= lit("1-URGENT")),
        col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(rows.find(_.getLong(0) === 0L).map(_.getLong(1)).getOrElse(0L)
      === noOrder)
  }
}
