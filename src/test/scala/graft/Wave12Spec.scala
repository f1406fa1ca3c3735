package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.Wave12Queries

/** Wave-12 operators: retrieval evaluation, Zipf slope, dataset card. */
class Wave12Spec extends SparkSuite {

  private val d = sf("sf0.001")

  test("retrieval eval: metrics bounded, a perfect system scores 1.0") {
    val rows = Wave12Queries.qRetrievalEval(spark, d).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val recall = r.getDouble(2); val mrr = r.getDouble(3)
      val ndcg = r.getDouble(4)
      assert(recall >= 0.0 && recall <= 1.0)
      assert(mrr >= 0.0 && mrr <= 1.0)
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9)
      assert(r.getLong(1) === math.round(recall * 10),
        "n_hits and recall must agree")
    }
    // the truth scored against itself is a perfect run: every metric 1.0
    import spark.implicits._
    val e = Tables.load(spark, d, "embeddings")
    val truth = graft.text.Similarity
      .bruteForceTopK(e, e.filter(col("vec_id") < 3), k = 10)
    val self = truth.select(col("query_id"),
        col("neighbor_id").as("doc_id"), col("rk").as("sys_rk"))
      .join(truth.select(col("query_id"),
        col("neighbor_id").as("doc_id"), col("rk").as("truth_rk")),
        Seq("query_id", "doc_id"))
    val idcg = (1 to 10).map(i => (11 - i)
      / (math.log(i + 1.0) / math.log(2.0))).sum
    val perfect = self
      .withColumn("gain", (lit(11) - col("truth_rk")).cast("double")
        / log2(col("sys_rk") + lit(1.0)))
      .groupBy("query_id")
      .agg((sum(col("gain")) / lit(idcg)).as("ndcg"))
      .collect()
    perfect.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9,
      "self-evaluation must be a perfect nDCG"))
  }

  test("zipf: slope is negative (frequency falls with rank) and the fit " +
      "matches a driver-side least squares") {
    val r = Wave12Queries.qZipf(spark, d).collect().head
    val n = r.getLong(0); val slope = r.getDouble(1)
    assert(n > 0)
    assert(slope < 0.0, s"Zipf slope must be negative, got $slope")
    val counts = Tables.load(spark, d, "documents")
      .select(explode(graft.text.TextStats.tokens(
        coalesce(col("text"), lit("")))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .collect().map(x => x.getString(0) -> x.getLong(1))
      .sortBy { case (t, f) => (-f, t) }.take(1000)
    val xy = counts.zipWithIndex.map { case ((_, f), i) =>
      (math.log(i + 1.0), math.log(f.toDouble)) }
    val nn = xy.length.toDouble
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val want = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
    assert(math.abs(slope - want) < 1e-4, s"$slope vs exact $want")
  }

  test("dataset card: totals reconcile with the corpus") {
    val rows = Wave12Queries.qDatasetCard(spark, d).collect()
    val docs = Tables.load(spark, d, "documents")
    assert(rows.map(_.getLong(1)).sum === docs.count())
    assert(rows.map(_.getLong(3)).sum ===
      docs.agg(sum(col("n_chars").cast("long"))).head().getLong(0))
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0, "pct_en")
      assert(r.getDouble(7) >= 0.0 && r.getDouble(7) < 1.0, "dup_rate")
      assert(r.getLong(6) <= r.getLong(1), "dups bounded by docs")
    }
  }
}
