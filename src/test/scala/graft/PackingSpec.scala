package graft

import org.apache.spark.sql.functions._

import graft.text.Packing

/** Sequence packing: chunk (window) vs next-fit (exact) semantics,
  * oversize documents, per-source state reset, layout determinism. */
class PackingSpec extends SparkSuite {

  import spark.implicits._

  private def doc(id: Long, source: String, nTokens: Int) =
    (id, source, Seq.fill(nTokens)("w").mkString(" "))

  test("chunk bins split on prefix sums; next-fit closes bins that would overflow") {
    // three 300-token docs, budget 512:
    //   chunk:   cum_before 0, 300, 600 -> bins 0, 0, 1 (second bin overflows)
    //   nextfit: 300 | 300 | 300        -> bins 0, 1, 2 (no bin exceeds 512)
    val docs = Seq(doc(1, "a", 300), doc(2, "a", 300), doc(3, "a", 300))
      .toDF("doc_id", "source", "text")
    val chunk = Packing.chunkByBudget(docs, 512)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(chunk == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
    val nf = Packing.nextFitBins(docs, 512)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(nf == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("a document larger than the budget gets a bin alone") {
    val docs = Seq(doc(1, "a", 600), doc(2, "a", 10), doc(3, "a", 10))
      .toDF("doc_id", "source", "text")
    val nf = Packing.nextFitBins(docs, 512)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(nf == Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("bins reset per source") {
    val docs = Seq(doc(1, "a", 400), doc(2, "a", 400),
                   doc(3, "b", 400), doc(4, "b", 400))
      .toDF("doc_id", "source", "text")
    val nf = Packing.nextFitBins(docs, 512)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(nf == Map((1L, "a") -> 0L, (2L, "a") -> 1L,
                     (3L, "b") -> 0L, (4L, "b") -> 1L))
  }

  test("packing laws on the real corpus: monotone bins, next-fit 2-approximation") {
    val docs = graft.io.Tables.load(spark, sf("sf0.001"), "documents")
    val budget = 512L
    val nf = Packing.nextFitBins(docs, budget)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(2), r.getLong(3)))
    nf.groupBy(_._1).foreach { case (src, rows) =>
      val ordered = rows.sortBy(_._2)
      // bins are assigned monotonically in doc order, no gaps
      val bins = ordered.map(_._4)
      assert(bins.head == 0L, s"$src first bin")
      bins.sliding(2).foreach { case Array(a, b) =>
        assert(b == a || b == a + 1, s"$src bins must step by 0 or 1")
      case _ => ()
      }
      // next-fit uses at most 2x the lower bound ceil(total/budget)
      // when no single doc exceeds the budget
      val total = ordered.map(_._3.toLong).sum
      if (ordered.forall(_._3 <= budget)) {
        val lower = (total + budget - 1) / budget
        val used = bins.max + 1
        assert(used <= 2 * lower, s"$src next-fit bound: $used > 2*$lower")
      }
    }
  }

  test("next-fit is layout-independent (same bins after a repartition)") {
    val docs = graft.io.Tables.load(spark, sf("sf0.001"), "documents")
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.nextFitBins(df, 512)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val a = run(docs)
    val b = run(docs.repartition(7))
    assert(a == b && a.nonEmpty)
    // no bin of >1 doc exceeds the budget (the next-fit invariant)
    val bad = Packing.nextFitBins(docs, 512)
      .groupBy("source", "bin")
      .agg(sum(col("n_tokens").cast("long")).as("total"),
           count(lit(1)).as("n"))
      .filter(col("n") > 1 && col("total") > 512)
    assert(bad.isEmpty, "a multi-doc bin exceeded the budget")
  }
}
