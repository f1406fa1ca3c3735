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
