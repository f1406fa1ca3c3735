package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.text.Similarity

/** IVF+PQ composite ANN (wave 71): the contract is (a) candidates are
  * a subset of the probed cells — the IVF bound on the corpus
  * fraction a query touches is real, not advisory — and (b) recall@5
  * against the exact top-k clears the registry floor. */
class IvfPqSpec extends SparkSuite {

  private val d = sf("sf0.001")

  test("candidates ⊆ probed cells, and recall@5 clears the 0.6 floor") {
    val e = Tables.load(spark, d, "embeddings")
    val q = e.filter(col("vec_id") < lit(10L))
    val (assigned, probes, result) = Similarity.ivfPqParts(
      e, q, k = 5, dim = 64, nLists = 8, nProbe = 5, nSub = 16,
      nCodes = 32, shortlist = 64, maxFitRows = 100000)
    val res = result.cache()
    try {
      // (a) CONTAINMENT: every returned neighbor's cell must be among
      // its query's probed cells — an escapee means the scoring path
      // touched a non-probed cell and the IVF cost bound is fiction
      val escapees = res
        .join(assigned.withColumnRenamed("vec_id", "neighbor_id"),
          "neighbor_id")
        .join(probes, Seq("query_id", "list_id"), "left_anti")
      assert(escapees.count() == 0L,
        "found a candidate from a non-probed cell")
      // probes themselves respect the dial
      val maxProbes = probes.groupBy("query_id")
        .agg(count(lit(1)).as("n")).agg(max(col("n"))).head().getLong(0)
      assert(maxProbes <= 5L)
      // (b) recall floor — the registry row's exact audit
      val audit = Similarity.recallAtK(res,
        Similarity.bruteForceTopK(e, q, k = 5), k = 5, floor = 0.6)
        .head()
      assert(audit.getAs[Int]("recall_ok") == 1,
        s"recall@5 under floor: $audit")
      assert(audit.getAs[Long]("n_queries") == 10L)
      // full k rows per query (probed cells hold plenty of candidates)
      assert(res.count() == 50L)
    } finally { res.unpersist(); () }
  }
}
