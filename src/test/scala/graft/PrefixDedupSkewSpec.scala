package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.{Dedup, TextStats}

/** prefixPairs caps the hot 8-token-prefix buckets (boilerplate
  * openings — the common-prefix skew bomb) while the OUTPUT must stay
  * identical to the uncapped naive self-join: cold buckets join
  * directly, hot long docs re-key on the 16-token prefix, and hot
  * short docs (8–15 tokens) take the output-bounded full-content-key
  * rescue. Proven here against the uncapped run on the real corpus and
  * on a synthetic common-opening corpus that forces all three
  * branches. */
class PrefixDedupSkewSpec extends SparkSuite {

  private def tokenized(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextStats.tokens(col("text")).as("toks"))

  private def naive(tok: DataFrame): Set[(Long, Long, Int, Int)] = {
    val wn = tok
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n"))
      .filter(col("n") >= 8)
    wn.as("a").join(wn.as("b"),
        col("a.n") < col("b.n") &&
          expr("slice(b.toks, 1, a.n)") === col("a.toks"))
      .select(col("a.doc_id"), col("b.doc_id"), col("a.n"), col("b.n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
  }

  private def capped(tok: DataFrame, cap: Long): Set[(Long, Long, Int, Int)] =
    Dedup.prefixPairs(tok, hotPrefixDf = cap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet

  test("hot-prefix cap leaves prefixPairs output unchanged on sf0.001") {
    val docs = graft.io.Tables.load(spark, sf("sf0.001"), "documents")
    val tok = tokenized(docs)
    assert(capped(tok, 256) == naive(tok))
    // force every bucket hot: output still equals the naive join
    assert(capped(tok, 0) == naive(tok))
  }

  test("cap fires on a common-opening corpus without changing output") {
    import spark.implicits._
    // 40 docs share an 8+-token boilerplate opening (prefix df = 40+ >
    // cap 8), then diverge — the license-header shape. Truncations are
    // injected at three lengths:
    //  - doc 100: 12 tokens, prefix of doc 0 -> HOT bucket, SHORT side
    //    (8 <= n < 16) -> the output-bounded rescue branch
    //  - doc 101: 18 tokens, prefix of doc 1 -> HOT bucket, 16-token
    //    re-key branch
    //  - docs 200/201: a cold-bucket pair with a distinct opening
    val opening = "terms of service apply to all users of this site"
    val base = (0 until 40).map { i =>
      (i.toLong,
        s"$opening body$i alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i")
    }
    val hotShort = Seq((100L,
      opening.split(" ").take(10).mkString(" ") + " " +
        base(0)._2.split(" ").slice(10, 12).mkString(" ")))
    val hotLong = Seq((101L, base(1)._2.split(" ").take(18).mkString(" ")))
    val coldPair = Seq(
      (200L, "completely different cooking recipe with pasta and sauce tonight"),
      (201L, "completely different cooking recipe with pasta and sauce tonight extended"))
    val docs = (base ++ hotShort ++ hotLong ++ coldPair).toDF("doc_id", "text")
    val tok = tokenized(docs)

    // the shared opening really exceeds the cap (the hot path fires)
    val hotDf = tok
      .select(md5(array_join(expr("slice(toks, 1, 8)"), " ").cast("binary"))
        .as("pk"))
      .groupBy("pk").count().agg(max("count")).first().getLong(0)
    assert(hotDf > 8, s"expected a hot 8-token prefix with df > 8, got $hotDf")

    val got = capped(tok, 8)
    val want = naive(tok)
    assert(got == want,
      s"hot-prefix cap changed output: got ${got.size} vs naive ${want.size}")
    // each injected truncation is found by the branch built for it
    assert(got.exists(p => p._1 == 100L && p._2 == 0L),
      "short truncation (100 -> 0) must survive via the rescue branch")
    assert(got.exists(p => p._1 == 101L && p._2 == 1L),
      "long truncation (101 -> 1) must survive via the 16-token re-key")
    assert(got.exists(p => p._1 == 200L && p._2 == 201L),
      "cold-bucket pair (200, 201) must survive")
    assert(!got.exists(p => p._1 >= 0L && p._1 < 40L && p._2 >= 0L && p._2 < 40L),
      "boilerplate-opening docs with distinct bodies must not pair")
  }

  test("degenerate corpora: all-identical openings and sub-8-token docs") {
    import spark.implicits._
    // every doc shares the SAME first 16 tokens (still-hot sub-bucket:
    // candidates stay quadratic but output must stay exact), plus docs
    // under the 8-token gate which are out of scope entirely
    val open16 = (1 to 16).map(i => s"w$i").mkString(" ")
    val longs = (0 until 12).map(i => (i.toLong, s"$open16 tail$i extra$i"))
    val trunc = Seq((100L, open16)) // exactly 16 tokens: prefix of every long
    val tiny = Seq((300L, "too few tokens here"))
    val tok = tokenized((longs ++ trunc ++ tiny).toDF("doc_id", "text"))
    val got = capped(tok, 4)
    assert(got == naive(tok))
    assert((0 until 12).forall(i => got.exists(p => p._1 == 100L && p._2 == i)),
      "the 16-token truncation must pair with every long doc")
    assert(!got.exists(p => p._1 == 300L || p._2 == 300L))
  }
}
