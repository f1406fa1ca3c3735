package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.Wave11Queries

/** Wave-11 operators: line-level dedup, HTML link graph, lambda-seam
  * backfill, matryoshka prefix fidelity, n-gram novelty. Oracles carry
  * the cross-engine value proof; these pin the semantic invariants. */
class Wave11Spec extends SparkSuite {

  private val d = sf("sf0.001")
  private def docs = Tables.load(spark, d, "documents")

  test("line dedup: planted boilerplate drops, unique lines survive") {
    val rows = Wave11Queries.qLineDedup(spark, d).collect()
    val n = docs.count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum === 3 * n,
      "every line accounted for")
    rows.foreach { r =>
      val id = r.getLong(0); val dropped = r.getLong(2)
      if (id % 4 <= 1) assert(dropped >= 1,
        s"doc $id: boilerplate header must drop")
      if (id % 2 == 0) assert(dropped >= 1,
        s"doc $id: shared footer must drop")
      if (id % 4 == 3) assert(dropped <= 1,
        s"doc $id: unique header+footer can lose at most its text line")
    }
  }

  test("link graph: handshake identity and bounded degrees") {
    val rows = Wave11Queries.qLinkGraph(spark, d).collect()
    val out = rows.map(_.getLong(1)).sum
    val in = rows.map(_.getLong(2)).sum
    assert(out === in, "every edge leaves one node and enters one")
    assert(rows.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 2),
      "each doc links to 1 or 2 distinct targets")
  }

  test("stream backfill: seam-deduped union equals the full batch rollup") {
    val got = Wave11Queries.qStreamBackfill(spark, d).collect()
    val want = Tables.load(spark, d, "events")
      .groupBy(date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH:mm:ss").as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.queries.Q.dsum(col("value")).as("total_value"))
      .orderBy("hour", "event_type").collect()
    assert(got.map(_.toSeq).toSeq === want.map(_.toSeq).toSeq)
  }

  test("matryoshka: wider prefixes track the full cosine more closely") {
    val rows = Wave11Queries.qMatryoshka(spark, d).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(8L, 16L, 32L))
    val nVecs = Tables.load(spark, d, "embeddings").count()
    assert(rows.forall(_.getLong(1) === nVecs - 1), "consecutive-id pairs")
    val avg = rows.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(avg(8L) >= avg(32L),
      s"avg error must shrink with prefix width: ${avg}")
    assert(rows.forall(_.getDouble(3) >= 0.0))
  }

  test("ngram novelty: the earliest shingled doc is fully novel and " +
      "novel counts sum to the distinct-shingle total") {
    val rows = Wave11Queries.qNgramNovelty(spark, d).collect()
    val withShingles = rows.filter(_.getLong(2) > 0)
    assert(withShingles.nonEmpty)
    val firstDoc = withShingles.minBy(_.getLong(0))
    assert(firstDoc.getDouble(4) === 1.0,
      "lowest doc_id sees every one of its shingles first")
    val totalNovel = rows.map(_.getLong(3)).sum
    val distinctShingles = docs.select(explode(
        graft.text.Dedup.shingles(coalesce(col("text"), lit("")))).as("g"))
      .select("g").distinct().count()
    assert(totalNovel === distinctShingles,
      "each distinct shingle is novel exactly once")
  }
}
