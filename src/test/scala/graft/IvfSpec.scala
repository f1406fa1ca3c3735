package graft

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.text.Similarity

class IvfSpec extends SparkSuite {

  test("IVF top-k finds exact duplicates and measures decent recall vs brute force") {
    val d = sf("sf0.001")
    val e = Tables.load(spark, d, "embeddings")
    val queries = e.filter(col("vec_id") < 10L)

    val brute = Similarity.bruteForceTopK(e, queries, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(e, queries, 5, nLists = 8, nProbe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // every query answered with k rows
    assert(ivf.groupBy(_._1).forall(_._2.size == 5))
    // probing half the lists should recover a majority of true neighbors
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall")
  }

  test("IVF quantizer fits on a capped hash sample without losing recall") {
    val d = sf("sf0.001")
    val e = Tables.load(spark, d, "embeddings")
    val queries = e.filter(col("vec_id") < 10L)
    // 500-row corpus, fit capped at 200: the sample branch is forced
    // (the registry SFs all sit under the default 100k cap) and the
    // recall floor must still hold — centroid quality needs only a
    // sample, which is the whole point of the cap
    val audit = Similarity.recallAtK(
      Similarity.ivfTopK(e, queries, 5, nLists = 8, nProbe = 4,
        maxFitRows = 200),
      Similarity.bruteForceTopK(e, queries, 5), k = 5, floor = 0.4)
      .collect().head
    assert(audit.getLong(0) == 10L)
    assert(audit.getInt(2) == 1, "sample-fit IVF recall collapsed")
  }

  test("sample-fit is deterministic: same capped fit, same assignment") {
    val d = sf("sf0.001")
    val e = Tables.load(spark, d, "embeddings")
    val queries = e.filter(col("vec_id") < 10L)
    def run() = Similarity.ivfTopK(e, queries, 5, nLists = 8, nProbe = 4,
        maxFitRows = 200)
      .select("query_id", "rk", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(run() == run())
  }

  test("pairRecall audit row: n_extra counts false pairs, flag follows floor") {
    import spark.implicits._
    val truth = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L))
      .toDF("vec_a", "vec_b")
    val found = Seq((1L, 2L), (1L, 3L), (7L, 8L)) // one pair not in truth
      .toDF("vec_a", "vec_b")
    val r = Similarity.pairRecall(found, truth, floor = 0.5).collect().head
    assert(r.getLong(0) == 4L)       // truth-side denominator
    assert(r.getLong(1) == 1L)       // the (7,8) false pair
    assert(r.getInt(2) == 1)         // 2 hits >= 0.5 * 4
    val strict = Similarity.pairRecall(found, truth, floor = 0.75)
      .collect().head
    assert(strict.getInt(2) == 0)
  }

  test("recallAtK audit row: flag follows the floor, denominator is truth-side") {
    import spark.implicits._
    val truth = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L))
      .toDF("query_id", "neighbor_id")
    // query 2 lost entirely by the ANN; query 1 fully recovered
    val found = Seq((1L, 10L), (1L, 11L), (1L, 99L))
      .toDF("query_id", "neighbor_id")
    val loose = Similarity.recallAtK(found, truth, k = 2, floor = 0.5)
      .collect().head
    assert(loose.getLong(0) == 2 && loose.getInt(1) == 2)
    assert(loose.getInt(2) == 1) // 2 hits of 2*2 = 0.5 >= 0.5
    val strict = Similarity.recallAtK(found, truth, k = 2, floor = 0.75)
      .collect().head
    assert(strict.getInt(2) == 0)
  }
}
