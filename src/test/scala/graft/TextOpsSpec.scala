package graft

import org.apache.spark.sql.functions._
import graft.text.{Dedup, Similarity, TextStats}

class TextOpsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "el perro es un animal que vive en la casa"),
    (3L, "der hund ist ein tier und das ist gut"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (5L, "completely different words appear here now")
  ).toDF("doc_id", "text")

  test("tokens split on whitespace and drop empties") {
    val n = docs.select(TextStats.tokenCount(col("text")).as("n"))
      .collect().map(_.getInt(0))
    assert(n.toSeq == Seq(9, 9, 10, 9, 9, 6))
  }

  test("language ID picks the list with most stopword hits") {
    val got = docs.select(col("doc_id"), TextStats.predictedLang(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) == "en")
    assert(got(2L) == "es")
    assert(got(3L) == "de")
    assert(got(5L) == "und") // no stopwords at all
  }

  test("shingles and ngrams return empty arrays for docs shorter than n") {
    // sequence(0, -1) in Spark is the DESCENDING range [0, -1]: unguarded,
    // a 1-token doc would feed slice(toks, 0, n) and throw at runtime
    val short = Seq((0L, "one"), (1L, "two words"), (2L, ""), (3L, "a b c"))
      .toDF("doc_id", "text")
    val got = short.select(col("doc_id"),
        size(Dedup.shingles(col("text"))).as("sh"),
        size(Dedup.ngrams(col("text"), 2)).as("bi"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(got(0L) == ((0, 0)))   // 1 token: no trigram, no bigram
    assert(got(1L) == ((0, 1)))   // 2 tokens: no trigram, one bigram
    assert(got(2L) == ((0, 0)))   // empty text
    assert(got(3L) == ((1, 2)))   // 3 tokens: one trigram, two bigrams
  }

  test("hammingPairs64 rejects radii the 4-chunk pigeonhole cannot cover") {
    val sigs = Seq((1L, 0L, 0L)).toDF("media_id", "sig_hi", "sig_lo")
    intercept[IllegalArgumentException] { Dedup.hammingPairs64(sigs, 4) }
  }

  test("exact dedup groups identical texts") {
    val g = Dedup.exactGroups(docs).filter(col("n_docs") > 1).collect()
    assert(g.length == 1)
    assert(g.head.getAs[Long]("n_docs") == 2)
    assert(g.head.getAs[Long]("keeper") == 0L)
  }

  test("jaccard pairs find the near-dup and the exact dup, nothing else") {
    val pairs = Dedup.jaccardPairs(docs, 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L), (0L, 4L), (1L, 4L)))
  }

  test("minhash-LSH verified output equals exact jaccard output") {
    val exact = Dedup.jaccardPairs(docs, 0.5)
      .select("doc_a", "doc_b", "jaccard").collect().toSet
    val mh = Dedup.minhashNearDups(docs, 0.5)
      .select("doc_a", "doc_b", "jaccard").collect().toSet
    assert(mh == exact)
  }

  test("simhash of identical text has hamming 0; near-dup small distance") {
    val pairs = Dedup.simhashNearDups(docs, maxDist = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((0L, 4L)) == 0) // identical text
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) > 0)
  }

  test("fingerprint is whitespace/case-canonical") {
    val d = Seq((0L, "Hello  World"), (1L, "hello world ")).toDF("doc_id", "text")
    val fps = d.select(TextStats.fingerprint(col("text"))).collect().map(_.getString(0))
    assert(fps(0) == fps(1))
  }

  test("cosine similarity known answers") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(2.0f, 2.0f)), (3L, Array(1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val cos = e.as("a").crossJoin(e.as("b"))
      .select(col("a.vec_id").as("x"), col("b.vec_id").as("y"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(cos((0L, 1L))) < 1e-12)          // orthogonal
    assert(math.abs(cos((2L, 3L)) - 1.0) < 1e-12)    // parallel
    assert(math.abs(cos((0L, 3L)) - math.sqrt(0.5)) < 1e-12)
  }

  test("brute-force top-k ranks by cosine desc with id tiebreak") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(1.0f, 0.05f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(e, e.filter(col("vec_id") === 0L), 2)
      .orderBy("rk").collect().map(_.getAs[Long]("neighbor_id"))
    assert(top.toSeq == Seq(3L, 1L))
  }

  test("LSH top-k finds an identical vector (same bucket guaranteed)") {
    val e = Seq(
      (0L, Array.fill(8)(0.5f)), (1L, Array.fill(8)(0.5f)),
      (2L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.lshTopK(e, e.filter(col("vec_id") === 0L), dim = 8, k = 1)
      .collect()
    assert(got.length == 1 && got.head.getAs[Long]("neighbor_id") == 1L)
    assert(math.abs(got.head.getAs[Double]("cos") - 1.0) < 1e-9)
  }
}
