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

  /** Top-`k` documents per query by BM25. `queryTerms` rows are
    * (query_id, term); `docsDf` needs (doc_id, text). */
  def bm25TopK(docsDf: DataFrame, queryTerms: DataFrame, k: Int): DataFrame = {
    val tok = docsDf.select(col("doc_id"),
      explode(TextStats.tokens(col("text"))).as("term"))
    val dl = docsDf.select(col("doc_id"),
      TextStats.tokenCount(col("text")).as("dl"))
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

  /** DuckDB twin of [[bm25TopK]]: `queriesValues` is a SQL VALUES list
    * of (query_id, term) rows matching the Spark-side frame. */
  def BM25_SQL(queriesValues: String, k: Int): String = {
    val T = TextStats.TOKENS("text")
    s"""WITH q(query_id, term) AS (VALUES $queriesValues),
       |tok AS (SELECT doc_id, unnest($T) AS term FROM documents),
       |dl AS (SELECT doc_id, len($T) AS dl FROM documents),
       |stats AS (SELECT count(*) AS n_docs,
       |                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
       |          FROM dl),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
       |       WHERE term IN (SELECT DISTINCT term FROM q)
       |       GROUP BY doc_id, term),
       |dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf
       |        GROUP BY term),
       |contrib AS (
       |  SELECT q.query_id, tf.doc_id, tf.term,
       |         ln(1.0 + (stats.n_docs - dft.df + 0.5) / (dft.df + 0.5))
       |           * (tf.tf * ${K1 + 1.0}) /
       |           (tf.tf + $K1 * (1.0 - $B + $B * dl.dl / stats.avgdl))
       |           AS c
       |  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id)
       |       CROSS JOIN stats JOIN q USING (term)),
       |folded AS (
       |  SELECT query_id, doc_id, count(*) AS n_terms_hit,
       |         list_sum(list(c ORDER BY term)) AS score
       |  FROM contrib GROUP BY query_id, doc_id),
       |ranked AS (
       |  SELECT query_id, doc_id, n_terms_hit, score,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY score DESC, doc_id) AS rk
       |  FROM folded)
       |SELECT query_id, CAST(rk AS INTEGER) AS rk, doc_id,
       |       CAST(n_terms_hit AS BIGINT) AS n_terms_hit,
       |       round(score, 6) AS score
       |FROM ranked WHERE rk <= $k ORDER BY query_id, rk""".stripMargin
  }
}
