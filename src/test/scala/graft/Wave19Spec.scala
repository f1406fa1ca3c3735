package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.{Q, Wave19Queries}

/** Wave-19 operators: BFS depth profile, TextRank keywords,
  * bitemporal history, tokenized join. */
class Wave19Spec extends SparkSuite {

  private val d = sf("sf0.001")

  test("bfs: depth rows partition the reachable set; the ring makes " +
      "everything reachable fast") {
    val rows = Wave19Queries.qBfsDepth(spark, d).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = Tables.load(spark, d, "documents").count()
    assert(rows.values.sum === n, "depth buckets + unreached = all nodes")
    assert(rows(0) === 1L, "root only at depth 0")
    assert(rows.getOrElse(1, 0L) >= 3L,
      "ring+chord give the root at least 3 neighbors")
    // frontier growth: each hop reaches more than the last few did
    assert(rows.getOrElse(4, 0L) > 0L, "hop 4 still expanding at sf0.001")
  }

  test("textrank: 20 keywords, all from the alphabetic vocabulary, " +
      "ranks positive and sorted") {
    val rows = Wave19Queries.qTextrankKeywords(spark, d).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getString(0).matches("^[a-z]{3,}$"))
      assert(r.getDouble(1) > 0.0)
    }
    val ranks = rows.map(_.getDouble(1))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
  }

  test("bitemporal: the pre-cutoff probe agrees across tx versions; " +
      "the post-cutoff probe differs (stale vs corrected knowledge)") {
    val rows = Wave19Queries.qBitemporal(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    val pre = "1996-06-15"
    val post = "1997-06-15"
    val prios = rows.keys.map(_._3).toSet
    prios.foreach { p =>
      assert(rows.get((1L, pre, p)) === rows.get((2L, pre, p)),
        s"pre-cutoff history must be tx-stable for $p")
    }
    val tx1post = rows.collect { case ((1L, `post`, _), (n, _)) => n }.sum
    val tx2post = rows.collect { case ((2L, `post`, _), (n, _)) => n }.sum
    assert(tx1post > 0 && tx2post > 0)
    val differs = prios.exists(p =>
      rows.get((1L, post, p)) != rows.get((2L, post, p)))
    assert(differs, "the correction must change the post-cutoff answer")
  }

  test("tokenized join matches the plain-key join exactly") {
    val got = Wave19Queries.qTokenizedJoin(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    val plain = Tables.load(spark, d, "customer")
      .join(Tables.load(spark, d, "orders"),
        col("c_custkey") === col("o_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), Q.dsum(col("o_totalprice")).as("rev"),
        countDistinct(col("c_custkey")).as("b"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    assert(got === plain)
  }
}
