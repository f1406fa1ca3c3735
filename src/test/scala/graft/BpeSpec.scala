package graft

import org.apache.spark.sql.functions._
import graft.text.{Bpe, TextStats}

/** BPE fit determinism, the declared two-pass replace application
  * semantics, lossless reconstruction, and the token-budget delta vs
  * the whitespace tokenizer that motivates the operator. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("fit picks max-count pairs with lexicographic tiebreak") {
    val merges = Bpe.fit(Seq(("low", 5L), ("lower", 2L), ("lowest", 2L)), 3)
    // (l,o) and (o,w) both count 9 -> lexicographically smaller wins,
    // then the merged symbol chains
    assert(merges == Seq(("l", "o"), ("lo", "w"), ("low", "e")))
  }

  test("fit is deterministic and stops when no pair repeats") {
    val wc = Seq(("abc", 1L), ("def", 1L), ("ghi", 1L))
    assert(Bpe.fit(wc, 10).isEmpty, "all pairs unique -> no merges")
    val seed = Bpe.seedText.split(" ").filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }.toSeq
    assert(Bpe.fit(seed.sortBy(_._1), 48) == Bpe.shipped)
  }

  test("declared left-greedy run semantics: aaaaa -> [aa, a, aa]") {
    val got = Seq("aaaaa").toDF("w")
      .select(trim(Bpe.applied(col("w"), Seq(("a", "a"))))).first().getString(0)
    assert(got == "aa a aa",
      "two-pass leftmost replace segments runs as declared")
  }

  test("two passes are exhaustive: no merge pattern survives application") {
    // alternating pairs force the pass-1 skip; pass 2 must catch them
    val words = Seq("ababab", "abababab", "aabb", "abba", "aaaa")
    val m = Seq(("a", "b"))
    val got = words.toDF("w")
      .select(Bpe.applied(col("w"), m)).collect().map(_.getString(0))
    got.foreach(s => assert(!s.contains(" a b "), s"unmerged pair in '$s'"))
  }

  test("reconstruction: concatenating tokens reproduces every corpus word") {
    val docs = graft.io.Tables.load(spark, sf("sf0.001"), "documents")
    val bad = docs.limit(50)
      .select(explode(TextStats.tokens(col("text"))).as("w"))
      .withColumn("rt", replace(trim(Bpe.applied(col("w"), Bpe.shipped)),
        lit(" "), lit("")))
      .filter(col("rt") =!= col("w"))
    assert(bad.isEmpty, "merge replay must only remove separator spaces")
  }

  test("token counts sit between whitespace and code-point counts, and compress") {
    val docs = graft.io.Tables.load(spark, sf("sf0.001"), "documents")
    val nChars = coalesce(aggregate(
      transform(TextStats.tokens(col("text")),
        w => size(regexp_extract_all(w, lit("(?s)."), lit(0))).cast("long")),
      lit(0L), (acc, x) => acc + x), lit(0L))
    val r = docs.select(
        TextStats.tokenCount(col("text")).cast("long").as("ws"),
        Bpe.tokenCount(col("text"), Bpe.shipped).as("bpe"),
        nChars.as("chars"))
      .agg(sum("ws"), sum("bpe"), sum("chars"),
        sum(when(col("bpe") < col("ws") || col("bpe") > col("chars"), 1L)
          .otherwise(0L)))
      .first()
    val (ws, bpe, chars, outOfBand) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(outOfBand == 0L, "per-doc: ws <= bpe <= chars must always hold")
    assert(bpe < chars, "merges must compress below the code-point count")
    assert(bpe > ws, "subword counts exceed whitespace counts")
  }

  test("fitOnCorpus is deterministic and its merges compress the corpus") {
    val docs = graft.io.Tables.load(spark, sf("sf0.001"), "documents")
    val m1 = Bpe.fitOnCorpus(docs, nMerges = 24)
    val m2 = Bpe.fitOnCorpus(docs, nMerges = 24)
    assert(m1 == m2 && m1.size == 24)
    val r = docs.select(
        Bpe.tokenCount(col("text"), m1).as("bpe"),
        Bpe.tokenCount(col("text"), Seq.empty).as("chars"))
      .agg(sum("bpe"), sum("chars")).first()
    assert(r.getLong(0) < r.getLong(1))
  }

  test("packing budgets move when counts switch from whitespace to BPE") {
    val docs = graft.io.Tables.load(spark, sf("sf0.001"), "documents")
    val budget = 512L
    val bins = docs.select(
        TextStats.tokenCount(col("text")).cast("long").as("ws"),
        Bpe.tokenCount(col("text"), Bpe.shipped).as("bpe"))
      .agg((ceil(sum("ws") / budget)).as("ws_bins"),
           (ceil(sum("bpe") / budget)).as("bpe_bins"))
      .first()
    assert(bins.getLong(1) > bins.getLong(0),
      "a trainer packing on subword counts needs more bins than the " +
        "whitespace estimate claims — the delta this operator exists to expose")
  }
}
