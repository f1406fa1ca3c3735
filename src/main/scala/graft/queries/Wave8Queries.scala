package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.text.{Dedup, Search, Similarity, TextStats}

/** Round-6 wave 8 — retrieval, sub-document dedup, compressed-vector
  * search, and the training-delivery/maintenance patterns around them:
  *
  *  - `q_span_dedup`: exact duplicated-SUBSTRING coverage per doc
  *    ([[Dedup.spanCoverage]]) — the signal doc-level dedup cannot
  *    see (a half-copied doc is "new" to exact/Jaccard dedup).
  *  - `q_bm25_search`: BM25 top-k keyword retrieval
  *    ([[Search.bm25TopK]]) — postings restricted to the broadcast
  *    query terms before any shuffle; scores bit-identical via the
  *    order-pinned float fold.
  *  - `q_ann_pq`: product-quantization ANN ([[Similarity.pqTopK]]) —
  *    the compressed-embedding search path (codes ~30× smaller than
  *    vectors), recall-audited against the exact top-k.
  *  - `q_epoch_shuffle`: deterministic seeded epoch permutation as
  *    shard assignment + within-shard order — the scale-honest global
  *    shuffle (no single global sort; order = concatenation of
  *    shards), pinned by a per-shard order checksum.
  *  - `q_state_merge`: incremental aggregate-state maintenance — the
  *    base state merged with a delta batch equals the full recompute
  *    (state kept in EXACT decimal so the merge is associative), with
  *    the mismatch count in-plan: the materialized-view pattern that
  *    avoids rescanning 100 TB per daily batch.
  */
object Wave8Queries {

  private def docs(s: SparkSession, d: String) = Tables.load(s, d, "documents")
  private def embs(s: SparkSession, d: String) = Tables.load(s, d, "embeddings")

  // ---- exact duplicated-substring coverage ----

  def qSpanDedup(s: SparkSession, d: String): DataFrame =
    Dedup.spanCoverage(docs(s, d), k = 8)

  // ---- BM25 retrieval ----

  /** Fixed query workload (terms from the corpus vocabulary). */
  private[queries] val bm25Terms: Seq[(Int, String)] = Seq(
    0 -> "spark", 0 -> "window", 0 -> "agg",
    1 -> "customer", 1 -> "query", 1 -> "join",
    2 -> "stream", 2 -> "filter", 2 -> "merge")

  def qBm25Search(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Search.bm25TopK(docs(s, d), bm25Terms.toDF("query_id", "term"), k = 10)
  }

  // ---- product-quantization ANN ----

  /** Same recall-audit shape as `q_ann_ivf`/`q_ann_lsh`: the found SET
    * is approximation-specific, so the oracle-checkable output is the
    * one-row audit — a collapsed recall flips `recall_ok` and fails
    * the hash. Production dial 16 subspaces × 32 codes (80-bit codes,
    * ~25× smaller than the fp32 vectors) + a 64-candidate exact
    * re-rank; measured recall@5 1.000 / 0.980 / 0.940 at
    * sf0.001/0.01/0.1 (`tools/PqRecall`), floor 0.6 under the band.
    * Pure-ADC ordering (no re-rank) measures 0.14–0.54 on these
    * near-uniform embeddings — the shortlist re-rank is the
    * production two-stage shape, not a test crutch. */
  def qAnnPq(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    val q = e.filter(col("vec_id") < lit(10L))
    Similarity.recallAtK(
      Similarity.pqTopK(e, q, k = 5, nSub = 16, nCodes = 32, shortlist = 64),
      Similarity.bruteForceTopK(e, q, k = 5), k = 5, floor = 0.6)
  }

  // ---- deterministic epoch shuffle ----

  /** Seeded epoch permutation, delivered the way a 100 TB trainer
    * consumes it: shard = 4 bits of md5("ep1:" || doc_id), order
    * within shard = (md5 hex, doc_id) — no global sort anywhere (the
    * global order is by construction the concatenation of shard
    * orders), the within-shard window parallelizes by shard, and a
    * new seed string is a new independent permutation. The md5 HEX
    * STRING is the sort key on both engines (lexicographic hex ==
    * unsigned numeric order — signed-long md5 keys would order
    * differently in Spark than DuckDB's UBIGINT). `order_checksum`
    * (Σ rank·doc_id) pins the full within-shard ORDER, not just
    * membership. */
  def qEpochShuffle(s: SparkSession, d: String): DataFrame = {
    val hex = md5(concat(lit("ep1:"), col("doc_id").cast("string")))
    val base = docs(s, d).select(col("doc_id"), col("source"),
        TextStats.tokenCount(col("text")).as("n_toks"), hex.as("h"))
      .withColumn("shard", conv(substring(col("h"), 32, 1), 16, 10).cast("int"))
    val w = Window.partitionBy("shard").orderBy("h", "doc_id")
    base.withColumn("rk", row_number().over(w))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("token_mass"),
        countDistinct(col("source")).as("n_sources"),
        max(when(col("rk") === 1, col("doc_id"))).as("first_doc"),
        sum(col("rk") * col("doc_id")).as("order_checksum"))
      .orderBy("shard")
  }

  // ---- incremental aggregate-state maintenance ----

  /** Per-customer (count, exact-decimal total) state over the pre-1999
    * lake, merged with the 1999+ delta batch, compared key-by-key
    * against the full recompute INSIDE the plan: `n_mismatch` must be
    * 0 or the hash fails. The state column stays DECIMAL(30,8) until
    * the final cast, so merge = addition is exact and associative —
    * the property that makes incremental maintenance correct at any
    * batch boundary (a float state would drift per merge order). */
  def qStateMerge(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val orders = Tables.load(s, d, "orders")
    def state(df: DataFrame) = df.groupBy("o_custkey")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(30, 8))).as("total"))
    val base = state(orders.filter(col("o_orderdate") < lit("1999-01-01")))
      .select(col("o_custkey"), col("n").as("n_b"), col("total").as("t_b"))
    val delta = state(orders.filter(col("o_orderdate") >= lit("1999-01-01")))
      .select(col("o_custkey"), col("n").as("n_d"), col("total").as("t_d"))
    val merged = base.join(delta, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L))).as("n_m"),
        (coalesce(col("t_b"), lit(0).cast(DecimalType(30, 8))) +
         coalesce(col("t_d"), lit(0).cast(DecimalType(30, 8)))).as("t_m"))
    val direct = state(orders)
      .select(col("o_custkey"), col("n").as("n_f"), col("total").as("t_f"))
    merged.join(direct, Seq("o_custkey"), "full_outer")
      .agg(count(lit(1)).as("n_keys"),
        sum(col("n_m")).as("n_rows"),
        sum(col("t_m")).cast("double").as("grand_total"),
        sum((col("n_m").isNull || col("n_f").isNull ||
             col("n_m") =!= col("n_f") ||
             col("t_m") =!= col("t_f")).cast("int")).as("n_mismatch"))
  }

  // ---- data-quality constraint audit ----

  def qDataQuality(s: SparkSession, d: String): DataFrame =
    graft.ops.Quality.ordersAudit(
      Tables.load(s, d, "orders"), Tables.load(s, d, "customer"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_span_dedup"    -> qSpanDedup,
    "q_bm25_search"   -> qBm25Search,
    "q_ann_pq"        -> qAnnPq,
    "q_epoch_shuffle" -> qEpochShuffle,
    "q_state_merge"   -> qStateMerge,
    "q_data_quality"  -> qDataQuality)

  private val T = TextStats.TOKENS("text")

  private val BM25_VALUES = bm25Terms
    .map { case (q, t) => s"($q, '$t')" }.mkString(", ")

  val oracles: Map[String, String] = Map(
    "q_data_quality" -> graft.ops.Quality.ORDERS_AUDIT_SQL,
    "q_span_dedup" -> Dedup.SPAN_COVERAGE(8),
    "q_bm25_search" -> Search.BM25_SQL(BM25_VALUES, 10),
    "q_ann_pq" ->
      """SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_queries,
        |  CAST(5 AS INTEGER) AS k, CAST(1 AS INTEGER) AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,
    "q_epoch_shuffle" ->
      s"""WITH b AS (
         |  SELECT doc_id, source, len($T) AS n_toks,
         |         md5('ep1:' || CAST(doc_id AS VARCHAR)) AS h
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id, source, n_toks, h,
         |         CAST(strpos('0123456789abcdef', substring(h, 32, 1)) - 1
         |              AS INTEGER) AS shard
         |  FROM b),
         |rk AS (
         |  SELECT *, row_number() OVER (PARTITION BY shard
         |                               ORDER BY h, doc_id) AS rk
         |  FROM sh)
         |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_toks) AS BIGINT) AS token_mass,
         |       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         |       max(CASE WHEN rk = 1 THEN doc_id END) AS first_doc,
         |       CAST(sum(rk * doc_id) AS BIGINT) AS order_checksum
         |FROM rk GROUP BY shard ORDER BY shard""".stripMargin,
    "q_state_merge" ->
      """WITH base AS (
        |  SELECT o_custkey, count(*) AS n_b,
        |         sum(CAST(o_totalprice AS DECIMAL(30,8))) AS t_b
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        |  GROUP BY o_custkey),
        |delta AS (
        |  SELECT o_custkey, count(*) AS n_d,
        |         sum(CAST(o_totalprice AS DECIMAL(30,8))) AS t_d
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
        |  GROUP BY o_custkey),
        |merged AS (
        |  SELECT o_custkey,
        |         coalesce(n_b, 0) + coalesce(n_d, 0) AS n_m,
        |         coalesce(t_b, 0) + coalesce(t_d, 0) AS t_m
        |  FROM base FULL OUTER JOIN delta USING (o_custkey)),
        |direct AS (
        |  SELECT o_custkey, count(*) AS n_f,
        |         sum(CAST(o_totalprice AS DECIMAL(30,8))) AS t_f
        |  FROM orders GROUP BY o_custkey)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |       CAST(sum(n_m) AS BIGINT) AS n_rows,
        |       CAST(CAST(sum(t_m) AS VARCHAR) AS DOUBLE) AS grand_total,
        |       CAST(sum(CASE WHEN n_m IS NULL OR n_f IS NULL
        |                       OR n_m <> n_f OR t_m <> t_f
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch
        |FROM merged FULL OUTER JOIN direct USING (o_custkey)""".stripMargin)
}
