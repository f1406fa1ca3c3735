package graft

import graft.text.Dedup

/** Incremental-ingestion gate: exact-vs-corpus, near-dup-vs-corpus,
  * and the batch-internal-dups-out-of-scope contract. */
class IncrementalIngestSpec extends SparkSuite {

  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta " +
    "iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"

  test("exact dup, near dup, and fresh batch docs gate correctly") {
    val corpus = Seq(
      (0L, "c", base),
      (2L, "c", "completely different corpus content here words many " +
        "more words fill the document with enough tokens for shingles"))
      .toDF("doc_id", "source", "text")
    val batch = Seq(
      (1L, "b", base),                          // exact dup of corpus 0
      (3L, "b", base + " extra"),               // near dup of corpus 0
      (5L, "b", "totally fresh text with nothing shared at all yes " +
        "truly nothing shared among any of these particular tokens"))
      .toDF("doc_id", "source", "text")
    val out = Dedup.incrementalFlags(batch, corpus, 0.8)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    assert(out(1L) == ((0, 0, 0)), s"exact dup must reject: $out")
    assert(out(3L) == ((1, 0, 0)), s"near dup must reject: $out")
    assert(out(5L) == ((1, 1, 1)), s"fresh doc must accept: $out")
  }

  test("batch-internal duplicates do NOT reject each other (documented scope)") {
    val corpus = Seq((0L, "c", "unrelated corpus words entirely disjoint " +
      "from everything in the incoming batch today completely"))
      .toDF("doc_id", "source", "text")
    val batch = Seq((1L, "b", base), (3L, "b", base))
      .toDF("doc_id", "source", "text")
    val out = Dedup.incrementalFlags(batch, corpus, 0.8)
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    // both accepted vs the CORPUS; collapsing them is the downstream
    // exactGroups/nearDupClusters pass on the accepted delta
    assert(out == Map(1L -> 1, 3L -> 1))
  }
}
