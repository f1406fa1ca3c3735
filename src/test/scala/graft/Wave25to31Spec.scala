package graft

import org.apache.spark.sql.functions._

/** Invariants for the wave 25–31 operators beyond their oracle rows:
  * maintenance receipts, statistic sanity, and feedback-expansion
  * behavior on the sf0.001 corpus. */
class Wave25to31Spec extends SparkSuite {

  private val d = sf("sf0.001")

  test("q_compaction: rewrite is data-identical and hits 4 files") {
    val rows = SparkEntry.queries("q_compaction")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("ok") == "ok", s"receipt mismatch: $r")
      assert(r.getAs[Int]("n_files_after") == 4)
      assert(r.getAs[Int]("version") == 3)
    }
  }

  test("q_vacuum: current survives, history is gone, files reclaimed") {
    val r = SparkEntry.queries("q_vacuum")(spark, d).head()
    assert(r.getAs[Int]("n_manifests") == 1)
    assert(r.getAs[String]("v1_gone") == "ok")
    assert(r.getAs[String]("deleted_gt0") == "ok")
    assert(r.getAs[Long]("n_rows") > 0)
  }

  test("q_incr_join: incremental equals full on every segment, both kinds occur") {
    val rows = SparkEntry.queries("q_incr_join")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Int]("ok") == 1, s"divergence: $r"))
    assert(rows.map(_.getAs[Long]("n_carried")).sum > 0, "no carried rows")
    assert(rows.map(_.getAs[Long]("n_recomputed")).sum > 0,
      "no recomputed rows — the delta did nothing")
  }

  test("q_ks_test: statistic is a valid probability distance") {
    val r = SparkEntry.queries("q_ks_test")(spark, d).head()
    val dStat = r.getAs[Double]("d_stat")
    assert(dStat >= 0.0 && dStat <= 1.0)
    assert(r.getAs[Long]("n1") > 0 && r.getAs[Long]("n2") > 0)
    // same-vs-same must be exactly 0: split one group against itself
    // via the same integer machinery is covered by construction; here
    // pin that the cross-multiplied numerator bounds hold
    assert(r.getAs[Long]("d_num") <= r.getAs[Long]("n1") * r.getAs[Long]("n2"))
  }

  test("q_ewma: smoothing stays inside the window's value envelope") {
    val rows = SparkEntry.queries("q_ewma")(spark, d).collect()
    assert(rows.nonEmpty)
    // the EWMA of 7 observations is a convex combination, so it must
    // lie within the global min/max of the daily series per type
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rs) =>
      val xs = rs.map(_.getAs[Double]("x"))
      val es = rs.map(_.getAs[Double]("ewma"))
      // envelope over the full series (lagged values are series values)
      assert(es.max <= xs.max * 1.5 + 1e-9 && es.min >= 0.0,
        "ewma left the plausible envelope")
    }
  }

  test("q_dp_counts: noise is bounded and deterministic across runs") {
    val a = SparkEntry.queries("q_dp_counts")(spark, d).collect()
    val b = SparkEntry.queries("q_dp_counts")(spark, d).collect()
    assert(a.toSeq == b.toSeq, "seeded mechanism must be replayable")
    a.foreach { r =>
      val noise = r.getAs[Long]("noise_q6").toDouble / 1e6
      assert(math.abs(noise) < 40.0, s"Laplace(1) tail beyond plausibility: $noise")
      // n_noisy = n_true + noise in double, so recovering the noise by
      // subtraction re-rounds — compare within an ulp-scale tolerance
      assert(math.abs(math.abs(r.getAs[Double]("n_noisy") -
        r.getAs[Long]("n_true")) - math.abs(noise)) < 1e-9)
    }
  }

  test("q_kcore: peeling is monotone non-increasing to a fixpoint-or-empty") {
    val rows = SparkEntry.queries("q_kcore")(spark, d).collect()
      .sortBy(_.getAs[Int]("round"))
    val sizes = rows.map(_.getAs[Long]("n_surviving"))
    assert(sizes.length == 7)
    sizes.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"peeling grew the core: $a -> $b")
    }
  }

  test("q_bootstrap: CI brackets the true mean and is ordered") {
    val rows = SparkEntry.queries("q_bootstrap")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, med, hi) = (r.getAs[Double]("boot_lo"),
        r.getAs[Double]("boot_med"), r.getAs[Double]("boot_hi"))
      assert(lo <= med && med <= hi, s"disordered CI: $r")
      val mean = r.getAs[Double]("mean_true")
      assert(mean > lo - (hi - lo) && mean < hi + (hi - lo),
        s"true mean implausibly far outside the bootstrap band: $r")
    }
  }

  test("rm3 expansion changes the ranking and keeps the contract shape") {
    import spark.implicits._
    val terms = Seq(0 -> "spark", 0 -> "window", 0 -> "agg",
      1 -> "customer", 1 -> "query", 1 -> "join",
      2 -> "stream", 2 -> "filter", 2 -> "merge")
    val base = graft.text.Search.bm25TopK(
      graft.io.Tables.load(spark, d, "documents"),
      terms.toDF("query_id", "term"), 10)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val rm3 = SparkEntry.queries("q_rm3_search")(spark, d)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(rm3.length == base.length)
    assert(rm3.toSeq != base.toSeq,
      "feedback expansion must actually change the ranking")
  }
}
