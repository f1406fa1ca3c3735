package graft

import org.apache.spark.sql.functions._
import graft.text.Dedup

/** The stop-shingle filter drops high-document-frequency shingles from
  * jaccardPairs' candidate self-join (the quadratic skew bomb at scale)
  * while verification stays on full shingle sets — so the OUTPUT must be
  * identical to the unfiltered run. Proven here on the real corpus at
  * both registry thresholds, and on a synthetic corpus where the filter
  * demonstrably fires. */
class DedupStopShingleSpec extends SparkSuite {

  test("stop-shingle filter leaves jaccardPairs output unchanged on sf0.001") {
    val docs = graft.io.Tables.load(spark, sf("sf0.001"), "documents")
    for (t <- Seq(0.5, 0.8)) {
      val filtered = Dedup.jaccardPairs(docs, t)
        .select("doc_a", "doc_b", "common", "jaccard").collect().toSet
      val full = Dedup.jaccardPairs(docs, t, stopShingleDf = Long.MaxValue)
        .select("doc_a", "doc_b", "common", "jaccard").collect().toSet
      assert(filtered == full, s"stop-shingle filter changed output at threshold $t")
    }
  }

  test("filter fires on boilerplate-heavy corpus without changing output") {
    import spark.implicits._
    // 40 docs share one boilerplate prefix (its shingles have df=40);
    // each doc carries unique content; docs 100/101 are a true near-dup
    // pair whose overlap is in RARE shingles.
    val boiler = "terms of service apply to all"
    val base = (0 until 40).map { i =>
      (i.toLong, s"$boiler document $i alpha$i beta$i gamma$i delta$i epsilon$i zeta$i")
    }
    val nearDup = Seq(
      (100L, s"$boiler shared body text one two three four five six seven"),
      (101L, s"$boiler shared body text one two three four five six eight"))
    val docs = (base ++ nearDup).toDF("doc_id", "text")

    // The boilerplate shingles really exceed the df threshold (filter fires).
    val hotDf = docs
      .select(explode(Dedup.shingles(col("text"))).as("shingle"), col("doc_id"))
      .groupBy("shingle").agg(countDistinct("doc_id").as("df"))
      .agg(max("df")).first().getLong(0)
    assert(hotDf > 8, s"expected hot shingles with df > 8, got max df $hotDf")

    val filtered = Dedup.jaccardPairs(docs, 0.5, stopShingleDf = 8)
      .select("doc_a", "doc_b", "jaccard").collect().toSet
    val full = Dedup.jaccardPairs(docs, 0.5, stopShingleDf = Long.MaxValue)
      .select("doc_a", "doc_b", "jaccard").collect().toSet
    assert(filtered == full)
    assert(filtered.exists(r => r.getLong(0) == 100L && r.getLong(1) == 101L),
      "near-dup pair (100,101) must survive the stop-shingle filter")
  }

  test("all-hot pairs are rescued: N boilerplate copies + a near-identical variant") {
    import spark.implicits._
    // 12 IDENTICAL copies: with stopShingleDf=8 every shingle they
    // contain is hot (df=12..13), so common_rare=0 for every pair —
    // the bound path alone would drop all of them. One variant doc
    // differs by a single trailing word (its last shingles are rare,
    // but shared shingles with the copies are all hot). Plus unrelated
    // docs that must NOT pair with anything.
    val body = "the quick brown fox jumps over the lazy dog again and again today"
    val copies = (0 until 12).map(i => (i.toLong, body))
    val variant = Seq((50L, body.replaceAll("today$", "tomorrow")))
    val unrelated = Seq(
      (60L, "completely different content about cooking pasta recipes"),
      (61L, "another unrelated text on mountain hiking trails"))
    val docs = (copies ++ variant ++ unrelated).toDF("doc_id", "text")

    val filtered = Dedup.jaccardPairs(docs, 0.5, stopShingleDf = 8)
      .select("doc_a", "doc_b", "common", "jaccard").collect().toSet
    val full = Dedup.jaccardPairs(docs, 0.5, stopShingleDf = Long.MaxValue)
      .select("doc_a", "doc_b", "common", "jaccard").collect().toSet
    assert(filtered == full,
      s"rescue must recover all-hot pairs: filtered ${filtered.size} vs exact ${full.size}")
    // every copy-copy pair present with J=1
    val copyPairs = for (a <- 0 until 12; b <- a + 1 until 12) yield (a.toLong, b.toLong)
    copyPairs.foreach { case (a, b) =>
      assert(filtered.exists(r => r.getLong(0) == a && r.getLong(1) == b &&
        r.getDouble(3) == 1.0), s"identical pair ($a,$b) missing or J != 1")
    }
    // variant pairs with each copy (high but < 1 jaccard)
    assert((0 until 12).forall(a => filtered.exists(r =>
      r.getLong(0) == a && r.getLong(1) == 50L && r.getDouble(3) < 1.0)),
      "variant (50) must pair with every copy")
    assert(!filtered.exists(r => r.getLong(0) >= 60L || r.getLong(1) >= 60L),
      "unrelated docs must not pair")
  }
}
