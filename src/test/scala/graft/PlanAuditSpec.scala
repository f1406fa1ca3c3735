package graft

import org.apache.spark.sql.execution.ExplainMode

/** Plan-stability audit across the ENTIRE query registry: every query
  * must analyze and plan at sf0.001, and none may degenerate into an
  * unintended cartesian/nested-loop product — the silent 100 TB killer
  * when a join condition is lost in a refactor. */
class PlanAuditSpec extends SparkSuite {

  // O(n²)-by-design exceptions: brute-force similarity (the oracles for
  // the LSH/IVF scale paths), the tiny broadcast probe sets, and the
  // band join against a 3-row inline tier table (BNLJ over a broadcast
  // micro-dimension is the correct plan for BETWEEN-bounds bucketing).
  // q_anomaly_days, q_tfidf_terms, q_pmi_bigrams, and q_key_skew
  // broadcast a 1-row global-stats frame (BNLJ over a single row — the
  // standard scalar-stats join pattern). q_cosine_pairs_lsh is the
  // scale-path RECALL AUDIT: its truth side deliberately forces the
  // exact all-pairs join (the thing the LSH path is measured against);
  // the LSH side itself stays equi-join (pinned by the gated-plan test
  // below).
  // q_heavy_hitters crossJoins its 1-row audit frames (n_tokens,
  // n_heavy, flags) — the same single-row-broadcast shape.
  // q_domain_rank crossJoins the 1-row node-count frame into the
  // 18-row rank vector on every PageRank iteration (N for the damping
  // term) — six 1-row broadcasts, never a data-sized product.
  // q_split_leakage crosses its two 1-row audit frames (split sizes ×
  // straddle counts) into the single output row.
  // q_mixture_weights crosses the 1-row total and 1-row denominator
  // frames into the 20-row source table.
  // q_hll_rollup crosses its two 1-row global frames (exact+direct
  // estimate × union estimate) into the single TOTAL row.
  private val intendedNestedLoop = Set(
    "q_ann_brute", "q_cosine_pairs", "q_cosine_pairs_lsh", "q_ann_ivf",
    "q_ann_lsh", "q_band_join",
    "q_anomaly_days", "q_tfidf_terms", "q_pmi_bigrams", "q_key_skew",
    "q_heavy_hitters", "q_domain_rank", "q_split_leakage",
    "q_mixture_weights", "q_hll_rollup",
    // q_bm25_search crossJoins the 1-row corpus-stats frame (N, avgdl)
    // — the scalar-stats single-row broadcast again. q_ann_pq's PQ side
    // is all equi-joins; the nested loop is its recall AUDIT's exact
    // brute-force truth side plus the 1-row audit crosses (the
    // q_ann_ivf shape).
    // q_data_quality crosses its two 1-row audit frames (scalar checks
    // × FK-orphan count) into the six-check output. q_mixture_interleave
    // crosses three 1-row scalar frames (token total, weight
    // denominator, latest finish time) — the q_mixture_weights shape.
    "q_bm25_search", "q_ann_pq", "q_data_quality", "q_mixture_interleave",
    // q_line_dedup and q_link_graph cross the 1-row corpus-count frame
    // (the size-scaled df threshold / the link-target modulus) — the
    // scalar-stats single-row broadcast shape again.
    "q_line_dedup", "q_link_graph",
    // q_retrieval_eval composes the brute-force truth side (intended
    // 3-row-broadcast non-equi probe, the q_ann_brute shape) with
    // BM25's 1-row corpus-stats cross — the q_hybrid_search
    // composition again, here as the scorer rather than the fusion.
    "q_retrieval_eval",
    // q_hybrid_search composes both audited retrievers, so it inherits
    // BM25's 1-row corpus-stats cross AND the brute-force cosine side's
    // intended 3-row-broadcast non-equi probe (the q_ann_brute shape;
    // the scale path swaps in the PQ/IVF retriever, same fusion).
    "q_hybrid_search",
    // wave 16: LangId crosses the 1-row train-doc-total frame (the NB
    // prior denominator) into the 5-row lang-stats frame — a 1-row
    // broadcast feeding model CONSTRUCTION, never a data-sized product
    // (the per-doc scoring join is a broadcast EQUI-join on bucket).
    // QualityModel crosses its 1-row class-statistics frame into the
    // scoring projection — the scalar-stats single-row broadcast shape.
    // q_curation_model inherits the LangId cross via its lang gate.
    "q_lang_id2", "q_lang_id2_eval", "q_curation_model",
    "q_quality_model", "q_quality_model_eval", "q_quality_roc",
    // r16: q_profile_orders zips its two 1-row aggregate results
    // (basic stats × distinct counts — split so the distinct Expand
    // never rides a SortAggregate with the min/max string buffers) —
    // the single-row-broadcast shape again, never a data-sized
    // product.
    "q_profile_orders",
    // wave 17: q_triangles crosses the 1-row corpus-count frame (the
    // link modulus, the q_link_graph shape) and assembles its single
    // output row from three 1-row audit frames; the wedge/closure
    // joins themselves are vertex-id equi-joins. q_dsir_weights
    // crosses its two 1-row token-total frames into the 2048-row
    // ratio lattice (the LangId prior-denominator shape); scoring is
    // a broadcast equi-join on bucket.
    "q_triangles", "q_dsir_weights",
    // wave 18: q_label_prop builds on the same linkEdges 1-row
    // corpus-count cross as q_triangles; propagation itself is all
    // vertex-keyed equi-joins.
    "q_label_prop",
    // wave 19: q_bfs_depth inherits the linkEdges 1-row cross and
    // assembles its unreached row from two 1-row count frames;
    // q_textrank_keywords crosses the 1-row node-count frame into the
    // 100-row rank vector each damped iteration (the q_domain_rank
    // shape exactly).
    "q_bfs_depth", "q_textrank_keywords",
    // wave 20: q_chi_square crosses the 1-row grand-total frame into
    // the 35-cell contingency table — the scalar-stats single-row
    // broadcast shape.
    "q_chi_square",
    // wave 21: q_benford crosses the 1-row order-count frame into the
    // 9-digit cell table — the scalar-stats single-row broadcast shape.
    "q_benford",
    // wave 30: q_tpch_q22 crosses the 1-row average-balance frame into
    // the customer filter (TPC-H's scalar subquery, decorrelated as the
    // standard single-row broadcast).
    "q_tpch_q22",
    // wave 67: q_tpch_q11's HAVING compares each group against the
    // 1-row grand-total frame (TPC-H's scalar subquery, same
    // decorrelated single-row broadcast as q_tpch_q22).
    "q_tpch_q11",
    // wave 31: q_rm3_search runs TWO BM25 passes, each inheriting the
    // 1-row corpus-stats cross (the q_bm25_search shape).
    "q_rm3_search",
    // wave 34: both activity ledgers cross a 1-row data-span frame
    // (max day / max month) to clip partial trailing windows — the
    // scalar-stats single-row broadcast shape.
    "q_rolling_dau", "q_growth_accounting",
    // wave 71: q_ann_ivfpq inherits the q_ann_ivf shape — the corpus
    // crosses the BROADCAST nLists-row centroid frame for the argmin
    // cell assignment (bounded candidate expansion, never data×data),
    // and the recall audit's exact truth side is the q_ann_brute
    // 10-query broadcast probe. Scoring itself is all equi-joins on
    // (list_id) and (query_id, m, code).
    "q_ann_ivfpq",
    // wave 72: q_tpcds_q23_cte decorrelates BOTH its CTE thresholds
    // (per-part average line count, 1.5× average customer revenue) as
    // 1-row broadcast crosses — the q_tpch_q22 scalar-subquery shape,
    // twice.
    "q_tpcds_q23_cte")

  test("every registry query plans; no unintended cartesian products") {
    val d = sf("sf0.001")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, d).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        val nested = plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin")
        if (nested && !intendedNestedLoop(name)) Some(name) else None
    }
    assert(offenders.isEmpty, s"unintended nested-loop plans: $offenders")
  }

  test("cosinePairs pairs via shuffle-replicate NL, never a corpus broadcast") {
    // audit the MINER's plan directly: the registry wrapper is
    // disk-memoized (Memo.cosPairs), so its plan is a parquet re-read
    val plan = graft.text.Similarity.cosinePairs(
        graft.io.Tables.load(spark, sf("sf0.001"), "embeddings"),
        threshold = 0.45)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("BroadcastExchange"),
      "q_cosine_pairs must not materialize the corpus as a broadcast build side")
    assert(plan.contains("CartesianProduct"),
      "expected the shuffle-replicate nested-loop (CartesianProduct) pairing")
  }

  test("cosinePairs above the size gate plans a hash join, never a cartesian") {
    import spark.implicits._
    import graft.text.Similarity
    val corpus = (0L until 50L).map(i =>
      (i, Array.tabulate(8)(j => ((i + j) % 5).toFloat)))
      .toDF("vec_id", "embedding")
    val gated = Similarity.cosinePairs(corpus, 0.8, maxExact = 10)
    val plan = gated.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"),
      "above the gate the LSH candidate path must never go quadratic:\n" + plan)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
           plan.contains("BroadcastHashJoin"),
      "candidate generation must be an equi-join on (table, piece)")
  }

  test("cosinePairsLsh emits only exact-verified pairs (subset of exact, same values)") {
    import spark.implicits._
    import graft.text.Similarity
    // clustered corpus: 5 groups of 6 near-identical vectors
    val corpus = (0L until 30L).map { i =>
      val g = (i % 5).toInt
      (i, Array.tabulate(8)(j =>
        (if (j == g) 10f else 1f) + 0.01f * (i / 5)))
    }.toDF("vec_id", "embedding")
    val exact = Similarity.cosinePairs(corpus, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.cosinePairsLsh(corpus, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(lsh.nonEmpty, "clustered near-dups must be found")
    lsh.foreach { case (pair, cos) =>
      assert(exact.contains(pair), s"false positive pair $pair")
      assert(exact(pair) == cos, s"cosine mismatch for $pair")
    }
    // clustered corpora are the design target: recall should be high here
    assert(lsh.size >= exact.size / 2,
      s"recall collapsed on a clustered corpus: ${lsh.size}/${exact.size}")
  }

  test("partitioned returns path never plans a single-partition window") {
    val d = sf("sf0.001")
    val long = SparkEntry.queries("q_returns_by_flag")(spark, d)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!long.contains("SinglePartition"),
      "the scale-path window must stay partitioned by asset:\n" + long)
    assert(long.contains("Window"), "expected a window operator")
    // the wide reference-parity path keeps its documented global-window
    // wart — pin it so a refactor can't silently swap the two
    val wide = SparkEntry.queries("q_daily_returns")(spark, d)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(wide.contains("SinglePartition"),
      "reference-parity wide path is single-partition by design")
  }

  test("star join broadcasts its dimensions; scans stay pruned") {
    val d = sf("sf0.001")
    val star = SparkEntry.queries("q_region_revenue")(spark, d)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(star.contains("BroadcastHashJoin"),
      "q_region_revenue must broadcast its small dimensions")
    assert(!star.contains("SortMergeJoin"),
      "no dimension in the sf-test star join should fall back to SMJ")

    val fp = SparkEntry.queries("q_filter_project")(spark, d)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(fp.contains("PushedFilters: [") && !fp.contains("PushedFilters: []"),
      "q_filter_project's predicate must reach the parquet scan")
  }

  test("oracle map keys are a subset of query keys and non-empty") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os -- qs}")
    assert(os.size >= 60)
    assert(qs.size >= 70)
  }
}
