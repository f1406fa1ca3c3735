package graft

import graft.text.Dedup

/** Connected components over near-dup pairs: transitivity (the whole
  * point — A≈B≈C collapses without an A,C comparison), chain depth
  * beyond one propagation round, and cluster isolation. */
class ClusterSpec extends SparkSuite {

  test("components merge chains transitively and keep clusters apart") {
    import spark.implicits._
    // chain 1-2-3-4-5 (diameter 4 forces multiple label rounds),
    // separate pair 10-11, separate triangle 20-21-22
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(cc(_) == 1L), s"chain broken: $cc")
    assert(cc(10L) == 10L && cc(11L) == 10L)
    assert(Seq(20L, 21L, 22L).forall(cc(_) == 20L))
    assert(cc.size == 10)
  }

  test("worst-case chain converges in O(log n) rounds, not O(diameter)") {
    import spark.implicits._
    // a 256-link path graph: the adversarial input for label
    // propagation (256 rounds); large-star/small-star must stay
    // logarithmic
    val n = 256
    val pairs = (0 until n).map(i => (i.toLong, i + 1L)).toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(pairs)
    val cc = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == n + 1)
    assert(cc.values.forall(_ == 0L), "single chain component rooted at 0")
    assert(rounds <= 15, s"round count must be logarithmic, got $rounds")
  }

  test("empty pair set yields empty clusters without iterating") {
    import spark.implicits._
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(pairs)
    assert(labels.count() == 0 && rounds == 0)
  }

  test("nearDupClusters on the corpus: members match pair graph, sizes consistent") {
    val docs = graft.io.Tables.load(spark, sf("sf0.001"), "documents")
    val pairs = Dedup.jaccardPairs(docs, 0.8)
      .select("doc_a", "doc_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val clusters = Dedup.nearDupClusters(docs, 0.8).collect()
    assert(clusters.map(_.getLong(0)).toSet == pairs,
      "cluster members must be exactly the docs appearing in some pair")
    // every cluster_id is a member of its own cluster, and sizes add up
    val byCluster = clusters.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, rows) =>
      assert(rows.map(_.getLong(0)).contains(cid), s"cluster $cid missing its min")
      assert(rows.forall(_.getLong(2) == rows.length))
      assert(rows.map(_.getLong(0)).min == cid, s"cluster id must be the min member")
    }
  }
}
