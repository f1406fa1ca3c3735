package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword retrieval over the corpus: BM25 top-k, the inverted-index
  * workhorse behind corpus search, query-based quality slicing, and
  * retrieval-augmented decontamination.
  *
  * Shape at 100 TB — the whole point is what NEVER gets built:
  *  - no global inverted index materializes; the token stream is
  *    semi-joined against the BROADCAST query-term list before any
  *    shuffle, so the postings that exist are exactly the query
  *    terms' postings (shuffle volume = occurrences of query terms,
  *    not corpus tokens);
  *  - document lengths are one linear groupBy(doc_id) (uniform key);
  *    the corpus-level scalars (N, avgdl) are a 1-row broadcast —
  *    the standard scalar-stats cross;
  *  - per-(query, doc) scoring folds each query's ≤ a-handful term
  *    contributions in SORTED TERM ORDER (the [[graft.queries]]
  *    float-fold discipline), so scores are bit-identical across
  *    layouts, cluster sizes, and the DuckDB oracle — which is what
  *    makes the top-k ORDER deterministic, not just the set;
  *  - top-k per query is one window over the scored candidates
  *    (parallel by query).
  *
  * Scoring is standard Okapi BM25 with the Lucene-style idf:
  * idf = ln(1 + (N - df + 0.5)/(df + 0.5)), contribution =
  * idf · tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)).
  */
object Search {

  val K1 = 1.2
  val B = 0.75

  /** The (doc_id, dl) token-length frame BM25 normalizes by — a pure
    * function of the corpus, exposed so callers can compute it once
    * (or disk-memoize it) and inject it into several scoring passes;
    * `None` keeps the self-contained behavior. */
  def docLengths(docsDf: DataFrame): DataFrame =
    docsDf.select(col("doc_id"),
      TextStats.tokenCount(col("text")).as("dl"))

  /** Top-`k` documents per query by BM25. `queryTerms` rows are
    * (query_id, term); `docsDf` needs (doc_id, text). `tokOpt` injects
    * a precomputed (doc_id, term) token stream — [[rm3TopK]] tokenizes
    * the corpus once and shares it across its passes. */
  def bm25TopK(docsDf: DataFrame, queryTerms: DataFrame, k: Int,
      dlOpt: Option[DataFrame] = None,
      tokOpt: Option[DataFrame] = None): DataFrame = {
    val tok = tokOpt.getOrElse(docsDf.select(col("doc_id"),
      explode(TextStats.tokens(col("text"))).as("term")))
    val dl = dlOpt.getOrElse(docLengths(docsDf))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))

    val terms = queryTerms.select(col("term")).distinct()
    // postings for query terms ONLY: broadcast semi-join BEFORE the
    // tf groupBy, so the corpus token stream is filtered map-side
    val tf = tok.join(broadcast(terms), Seq("term"), "left_semi")
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))

    val contrib = tf
      .join(broadcast(dfT), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .join(broadcast(queryTerms), "term")
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("c", col("idf") * (col("tf") * lit(K1 + 1.0)) /
        (col("tf") + lit(K1) * (lit(1.0) - lit(B) +
          lit(B) * col("dl") / col("avgdl"))))
      .select(col("query_id"), col("doc_id"), col("term"), col("c"))

    // order-pinned fold over the (sorted) per-term contributions →
    // bit-identical score on any layout and in the oracle
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"))
    contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sort_array(collect_list(struct(col("term"), col("c"))))
          .as("terms"),
        count(lit(1)).as("n_terms_hit"))
      .withColumn("score",
        expr("aggregate(terms, 0d, (acc, x) -> acc + x.c)"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= lit(k))
      .select(col("query_id"), col("rk").cast("int").as("rk"),
        col("doc_id"), col("n_terms_hit"),
        round(col("score"), 6).as("score"))
      .orderBy("query_id", "rk")
  }

  /** RM3-style pseudo-relevance feedback: run [[bm25TopK]], treat each
    * query's top `kFeedback` documents as relevant, extract the
    * `nExpand` strongest NEW terms from them (relevance-model weight
    * wt(t) = Σ_d tf(t,d)/dl(d), folded in doc-id order so the weight —
    * and therefore the SELECTION — is bit-identical cross-engine; ties
    * broken by term), append them to the query, and re-score.
    *
    * Scale shape: the feedback doc set is (queries × kFeedback) rows —
    * broadcast by construction — so the full-vocabulary tf pass runs
    * only over those few documents (semi-join before the groupBy, the
    * same postings-restriction discipline as the first pass); both
    * BM25 passes keep their no-global-index property. */
  def rm3TopK(docsDf: DataFrame, queryTerms: DataFrame,
      kFeedback: Int = 10, nExpand: Int = 5, k: Int = 10,
      dlOpt: Option[DataFrame] = None,
      tokOpt: Option[DataFrame] = None): DataFrame = {
    // tokenize the corpus ONCE and share it across the three consumers
    // (first-pass postings, feedback tf, second-pass postings): the
    // regex token split is the dominant per-row cost, and without the
    // cache each pass re-tokenizes the full corpus — measured 2.3×
    // wall on q_rm3_search. MEMORY_AND_DISK degrades gracefully: an
    // evicted block recomputes its partition, i.e. worst case equals
    // the uncached behavior, so this is safe at any corpus size.
    // r16: callers that hold a disk-memoized (doc_id, term) stream
    // (Memo.docTerms — same values by construction) inject it via
    // tokOpt; the internal persist then never materializes and the
    // swap below releases only this call's own frames.
    val tokFresh = tokOpt.isEmpty
    val tok = tokOpt.getOrElse(docsDf.select(col("doc_id"),
        explode(TextStats.tokens(col("text"))).as("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val top = bm25TopK(docsDf, queryTerms, kFeedback, dlOpt, Some(tok))
      .select(col("query_id"), col("doc_id"))
    val dl = dlOpt.getOrElse(docLengths(docsDf))
    val ftf = tok
      .join(broadcast(top.select("doc_id").distinct()), Seq("doc_id"),
        "left_semi")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val fb = broadcast(top).join(ftf, "doc_id").join(dl, "doc_id")
      .groupBy(col("query_id"), col("term"))
      .agg(sort_array(collect_list(struct(col("doc_id"),
        (col("tf").cast("double") / col("dl")).as("w")))).as("ws"))
      .withColumn("wt", expr("aggregate(ws, 0d, (acc, x) -> acc + x.w)"))
    val novel = fb.join(queryTerms, Seq("query_id", "term"), "left_anti")
    val wE = Window.partitionBy("query_id")
      .orderBy(col("wt").desc, col("term"))
    val expansion = novel.withColumn("r", row_number().over(wE))
      .filter(col("r") <= lit(nExpand)).select("query_id", "term")
    // the expanded query is tiny (queries × (terms + nExpand) rows)
    // but its LINEAGE contains the whole first pass; the second pass
    // references it from several broadcast subtrees, each of which
    // would re-run that lineage — persist so the first pass runs once
    val q2 = queryTerms.select("query_id", "term")
      .unionByName(expansion).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one-generation cache discipline: the NEXT rm3TopK call (not
    // session end) releases this call's tok/q2 blocks — disk-spilled
    // MEMORY_AND_DISK blocks are never evicted by memory pressure,
    // so without this a long-lived session accumulates dead spill
    // collision-free per-session key (r15 ADVICE #4): hashCode is
    // collision-prone across sessions — two sessions colliding would
    // unpersist each other's live generation (correct via recompute,
    // but a silent cache loss); ScopedCache mints a UUID per session
    graft.ops.ScopedCache.swap(
      graft.ops.ScopedCache.sessionKey("rm3TopK", docsDf.sparkSession),
      if (tokFresh) Seq(tok, q2) else Seq(q2))
    bm25TopK(docsDf, q2, k, dlOpt, Some(tok))
  }

  /** Corpus-side CTEs shared by every BM25 replay (query-independent). */
  private def corpusCtes: String = {
    val T = TextStats.TOKENS("text")
    s"""tok AS (SELECT doc_id, unnest($T) AS term FROM documents),
       |dl AS (SELECT doc_id, len($T) AS dl FROM documents),
       |stats AS (SELECT count(*) AS n_docs,
       |                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
       |          FROM dl)""".stripMargin
  }

  /** One BM25 scoring pass against query table `q`, CTE names prefixed
    * with `p` so two passes (plain + feedback-expanded) can coexist in
    * one statement; ends in `<p>ranked(query_id, doc_id, n_terms_hit,
    * score, rk)`. */
  private def scoreCtes(p: String, q: String): String =
    s"""${p}tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
       |       WHERE term IN (SELECT DISTINCT term FROM $q)
       |       GROUP BY doc_id, term),
       |${p}dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM ${p}tf
       |        GROUP BY term),
       |${p}contrib AS (
       |  SELECT $q.query_id, ${p}tf.doc_id, ${p}tf.term,
       |         ln(1.0 + (stats.n_docs - ${p}dft.df + 0.5)
       |             / (${p}dft.df + 0.5))
       |           * (${p}tf.tf * ${K1 + 1.0}) /
       |           (${p}tf.tf + $K1 * (1.0 - $B + $B * dl.dl / stats.avgdl))
       |           AS c
       |  FROM ${p}tf JOIN ${p}dft USING (term) JOIN dl USING (doc_id)
       |       CROSS JOIN stats JOIN $q USING (term)),
       |${p}folded AS (
       |  SELECT query_id, doc_id, count(*) AS n_terms_hit,
       |         list_sum(list(c ORDER BY term)) AS score
       |  FROM ${p}contrib GROUP BY query_id, doc_id),
       |${p}ranked AS (
       |  SELECT query_id, doc_id, n_terms_hit, score,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY score DESC, doc_id) AS rk
       |  FROM ${p}folded)""".stripMargin

  private def rankedSelect(p: String, k: Int): String =
    s"""SELECT query_id, CAST(rk AS INTEGER) AS rk, doc_id,
       |       CAST(n_terms_hit AS BIGINT) AS n_terms_hit,
       |       round(score, 6) AS score
       |FROM ${p}ranked WHERE rk <= $k ORDER BY query_id, rk""".stripMargin

  /** DuckDB twin of [[bm25TopK]]: `queriesValues` is a SQL VALUES list
    * of (query_id, term) rows matching the Spark-side frame. */
  def BM25_SQL(queriesValues: String, k: Int): String =
    s"""WITH q(query_id, term) AS (VALUES $queriesValues),
       |$corpusCtes,
       |${scoreCtes("", "q")}
       |${rankedSelect("", k)}""".stripMargin

  /** DuckDB twin of [[rm3TopK]] — the same two BM25 passes around the
    * doc-id-ordered relevance-model fold. */
  def RM3_SQL(queriesValues: String, kFeedback: Int, nExpand: Int,
      k: Int): String =
    s"""WITH q(query_id, term) AS (VALUES $queriesValues),
       |$corpusCtes,
       |${scoreCtes("b_", "q")},
       |top_fb AS (SELECT query_id, doc_id FROM b_ranked
       |  WHERE rk <= $kFeedback),
       |ftf AS (SELECT doc_id, term, count(*) AS tf FROM tok
       |  WHERE doc_id IN (SELECT doc_id FROM top_fb)
       |  GROUP BY doc_id, term),
       |fb AS (SELECT top_fb.query_id, ftf.term,
       |    list_sum(list(CAST(ftf.tf AS DOUBLE) / dl.dl
       |      ORDER BY ftf.doc_id)) AS wt
       |  FROM top_fb JOIN ftf ON ftf.doc_id = top_fb.doc_id
       |  JOIN dl ON dl.doc_id = ftf.doc_id
       |  GROUP BY 1, 2),
       |novel AS (SELECT * FROM fb
       |  WHERE NOT EXISTS (SELECT 1 FROM q
       |    WHERE q.query_id = fb.query_id AND q.term = fb.term)),
       |expansion AS (SELECT query_id, term FROM (
       |    SELECT query_id, term, row_number() OVER (
       |      PARTITION BY query_id ORDER BY wt DESC, term) AS r
       |    FROM novel) WHERE r <= $nExpand),
       |q2 AS (SELECT query_id, term FROM q
       |  UNION SELECT query_id, term FROM expansion),
       |${scoreCtes("r_", "q2")}
       |${rankedSelect("r_", k)}""".stripMargin
}
