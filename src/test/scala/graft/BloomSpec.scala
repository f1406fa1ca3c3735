package graft

import org.apache.spark.sql.functions._
import graft.functions.Bloom

/** The Bloom ingest prefilter: the sketch never loses a duplicate (no
  * false negatives), an UNDERSIZED filter's false positives are
  * rescued by the exact verify join (composed output still equals the
  * plain anti-join), and an adequately sized filter actually prunes
  * (most new rows never reach the join). */
class BloomSpec extends SparkSuite {
  import spark.implicits._

  private def lakeDf = (0L until 500L).map(i => (i, s"lake_$i"))
    .toDF("id", "key")
  // 200 dups of lake keys + 300 fresh keys
  private def batchDf = ((0L until 200L).map(i => (1000L + i, s"lake_$i")) ++
    (0L until 300L).map(i => (2000L + i, s"fresh_$i"))).toDF("id", "key")

  private def exactNew = batchDf.as("b")
    .join(lakeDf.select("key").distinct().as("l"), Seq("key"), "left_anti")
    .select("id").collect().map(_.getLong(0)).toSet

  test("no false negatives: every lake key probes true") {
    val bf = Bloom.build(lakeDf, col("key"), 1L << 10, 1L << 14)
    val misses = lakeDf.filter(!Bloom.mightContain(bf, col("key"))).count()
    assert(misses == 0L, "a Bloom filter must never miss an inserted key")
  }

  test("undersized filter (forced false positives) still yields the exact gate") {
    // 64 bits for 500 keys → nearly every probe collides; the verify
    // join must rescue every false positive
    val bf = Bloom.build(lakeDf, col("key"), 1L << 10, 64L)
    val fpHits = batchDf.filter(col("id") >= 2000L)
      .filter(Bloom.mightContain(bf, col("key"))).count()
    assert(fpHits > 0L, "the undersized filter should produce false positives")
    val flagged = Bloom.newFlags(batchDf, lakeDf, "key",
      expectedItems = 1L << 10, numBits = 64L)
    val got = flagged.filter(col("is_new")).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(got == exactNew, "false positives must be removed by the verify join")
  }

  test("sized filter prunes: fresh keys mostly skip the verify join, gate still exact") {
    val bf = Bloom.build(lakeDf, col("key"), 1L << 10, 1L << 14)
    val hits = batchDf.withColumn("hit", Bloom.mightContain(bf, col("key")))
    val freshHits = hits.filter(col("id") >= 2000L && col("hit")).count()
    assert(freshHits < 30L,
      s"16384 bits / 500 keys should pass <10% false positives, saw $freshHits/300")
    // every true dup is a hit (the join input covers all real work)
    val dupMisses = hits.filter(col("id") < 2000L && !col("hit")).count()
    assert(dupMisses == 0L)
    val got = Bloom.newFlags(batchDf, lakeDf, "key")
      .filter(col("is_new")).select("id").collect().map(_.getLong(0)).toSet
    assert(got == exactNew)
  }

  test("streaming bloom gate with an undersized sketch equals the exact stream gate") {
    val d = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val exact = rows(graft.streaming.Events.streamingIngestGate(spark, d))
    // 64 bits: nearly every probe is a false positive — the verify
    // branch must clear them all; misses (if any) ride the no-join path
    val viaBloom = rows(
      graft.streaming.Events.streamingBloomGate(spark, d, numBits = 64L))
    assert(exact.nonEmpty && viaBloom == exact,
      "the sketch path must admit exactly the exact gate's documents")
  }
}
