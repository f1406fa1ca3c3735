package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.text.TextStats

/** Fourth wave: report-layer output (the reference's email/chart
  * contract), column profiling (data-quality gate), math/bit scalar
  * batteries, token-length histogram. */
object Wave4Queries {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** Reference report row (graft.report.Summary): formatted dd/MM/yyyy
    * period bounds (ref F2), `%.2f` means (ref `controller/app.py:194`). */
  def qReport(s: SparkSession, d: String): DataFrame =
    graft.report.Summary.reportRow(s, d)

  /** Column profile of orders (ops.Profile). */
  def qProfileOrders(s: SparkSession, d: String): DataFrame =
    graft.ops.Profile.profile(t(s, d, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"))
      .orderBy("col_name")

  /** Math scalar battery (transcendentals rounded — libm vs StrictMath
    * may differ in the last ulp). */
  def qMathBattery(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").filter(col("l_orderkey") < lit(100L))
      .select(col("l_orderkey"), col("l_linenumber"),
        round(log(col("l_extendedprice")), 6).as("ln_price"),
        round(log10(col("l_extendedprice")), 6).as("log10_price"),
        round(exp(col("l_discount")), 6).as("exp_disc"),
        round(pow(col("l_quantity"), 2.0), 6).as("qty_sq"),
        round(sin(col("l_discount")), 6).as("sin_disc"),
        round(cos(col("l_discount")), 6).as("cos_disc"),
        round(atan(col("l_tax")), 6).as("atan_tax"),
        signum(col("l_quantity") - lit(25.0)).as("sign_qty"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Bitwise scalar battery. */
  def qBitBattery(s: SparkSession, d: String): DataFrame =
    t(s, d, "part").filter(col("p_partkey") < lit(100L))
      .select(col("p_partkey"),
        col("p_partkey").bitwiseAND(lit(255L)).as("and255"),
        col("p_partkey").bitwiseOR(lit(4096L)).as("or4096"),
        col("p_partkey").bitwiseXOR(lit(170L)).as("xor170"),
        shiftleft(col("p_partkey"), 2).as("shl2"),
        shiftright(col("p_partkey"), 1).as("shr1"),
        bit_count(col("p_partkey")).as("popcount"))
      .orderBy("p_partkey")

  /** Token-count histogram over documents (bucket width 50). */
  def qTokenHistogram(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select((floor(TextStats.tokenCount(col("text")) / lit(50)) * 50)
        .cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_docs"))
      .orderBy("bucket")

  /** Extended string battery: padding/slicing/search + levenshtein
    * fuzzy distance (the cheap pre-filter for fuzzy entity matching). */
  def qStringBattery(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").filter(col("c_custkey") < lit(100L))
      .select(col("c_custkey"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded_key"),
        rpad(col("c_mktsegment"), 12, ".").as("padded_seg"),
        reverse(col("c_name")).as("rev_name"),
        translate(col("c_name"), "#", "-").as("dashed"),
        repeat(substring(col("c_mktsegment"), 1, 2), 2).as("seg2x"),
        substring(col("c_name"), 1, 4).as("name4"),
        instr(col("c_name"), "#").cast("int").as("hash_pos"),
        levenshtein(col("c_mktsegment"), lit("MACHINERY")).as("lev_machinery"),
        ascii(col("c_mktsegment")).as("seg_ascii"))
      .orderBy("c_custkey")

  /** Corpus bigram frequency table (top 50) — the n-gram statistics
    * pass of a data-curation pipeline. */
  def qBigrams(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").repartition(col("doc_id"))
      .select(explode(graft.text.Dedup.shingles(col("text"), n = 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(50)

  /** Repetition ratio — share of the document taken by its most frequent
    * token; the standard boilerplate/spam signal. */
  def qRepetition(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").repartition(col("doc_id"))
      .select(col("doc_id"), explode(TextStats.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(round(max(col("c")).cast("double") / sum(col("c")), 6).as("repetition_ratio"),
           max(col("c")).as("top_token_count"),
           sum(col("c")).as("n_tokens"))
      .orderBy("doc_id")

  /** Bigrams exclusive to a single source — the novelty/duplication
    * fingerprint of each feed in a multi-source corpus.
    *
    * r16: the (source, bigram) stream is explicitly DISTINCT, so
    * `countDistinct(source)` per bigram is plain `count(*)` — the old
    * form stacked a four-phase SortAggregate dedup (distinct-aggregate
    * machinery re-deduplicating already-distinct rows, with min's
    * string buffer forcing sort aggregation) and shuffled the bigram
    * strings two extra times. Identical output by construction. */
  def qSourceExclusiveBigrams(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").repartition(col("doc_id"))
      .select(col("source"),
        explode(graft.text.Dedup.shingles(col("text"), n = 2)).as("bigram"))
      .distinct()
      .groupBy("bigram")
      .agg(count(lit(1)).as("n_sources"),
           min(col("source")).as("only_source"))
      .filter(col("n_sources") === 1)
      .groupBy(col("only_source").as("source"))
      .agg(count(lit(1)).as("n_exclusive_bigrams"))
      .orderBy("source")

  /** Near-duplicate pairs whose language labels DISAGREE — the
    * mislabeled-copy / cross-lingual-dup detector built by joining the
    * Jaccard pair output back to document metadata. */
  def qCrossLangDups(s: SparkSession, d: String): DataFrame = {
    val docs0 = docsT(s, d)
    val pairs = graft.text.Dedup.jaccardPairs(docs0, 0.5)
    val meta = docs0.select(col("doc_id"), col("lang"))
    pairs
      .join(meta.select(col("doc_id").as("doc_a"), col("lang").as("lang_a")), "doc_a")
      .join(meta.select(col("doc_id").as("doc_b"), col("lang").as("lang_b")), "doc_b")
      .filter(col("lang_a") =!= col("lang_b"))
      .select(col("doc_a"), col("doc_b"), col("lang_a"), col("lang_b"),
              col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  private def docsT(s: SparkSession, d: String) = t(s, d, "documents")

  /** Per-source corpus statistics — the curation dashboard rollup. */
  def qSourceStats(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           (Q.dsum(col("n_chars").cast("double")) / count(lit(1))).as("avg_chars"),
           countDistinct(col("lang")).as("n_langs"),
           min(col("n_chars")).as("min_chars"),
           max(col("n_chars")).as("max_chars"))
      .orderBy("source")

  private def viewed(s: SparkSession, d: String, names: String*): Unit =
    names.foreach(n => t(s, d, n).createOrReplaceTempView(n))

  /** Correlated scalar subquery (decorrelated by Catalyst to a join):
    * customers above their segment's average balance. */
  def qScalarSubquery(s: SparkSession, d: String): DataFrame = {
    viewed(s, d, "customer")
    s.sql("""
      |SELECT c_custkey, c_mktsegment, c_acctbal
      |FROM customer c
      |WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.5 FROM customer
      |                   WHERE c_mktsegment = c.c_mktsegment)
      |ORDER BY c_custkey""".stripMargin)
  }

  /** Value-range window frame (RANGE over calendar days, not rows —
    * differs from rowsBetween whenever the series has gaps). */
  def qRangeFrame(s: SparkSession, d: String): DataFrame = {
    viewed(s, d, "lineitem")
    s.sql(s"""
      |WITH daily AS (
      |  SELECT CAST(l_shipdate AS DATE) AS day,
      |         ${Q.DSUM_SPARK(Q.REVENUE)} AS price
      |  FROM lineitem GROUP BY 1)
      |SELECT day, price,
      |  round(sum(price) OVER (ORDER BY day
      |    RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW), 4) AS sum7d
      |FROM daily ORDER BY day""".stripMargin)
  }

  /** LATERAL correlated subquery: each segment's two highest-balance
    * customers via a per-row dependent subquery. */
  def qLateral(s: SparkSession, d: String): DataFrame = {
    viewed(s, d, "customer")
    s.sql("""
      |SELECT segs.c_mktsegment, top.c_custkey, top.c_acctbal
      |FROM (SELECT DISTINCT c_mktsegment FROM customer) segs,
      |LATERAL (SELECT c_custkey, c_acctbal FROM customer
      |         WHERE c_mktsegment = segs.c_mktsegment
      |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) top
      |ORDER BY segs.c_mktsegment, top.c_acctbal DESC, top.c_custkey""".stripMargin)
  }

  /** Array-function battery over tokenized documents. */
  def qArrayBattery(s: SparkSession, d: String): DataFrame = {
    val toks = TextStats.tokens(col("text"))
    t(s, d, "documents").filter(col("doc_id") < lit(50L))
      .select(col("doc_id"),
        size(toks).as("n"),
        array_contains(toks, "data").as("has_data"),
        arrays_overlap(toks, typedLit(Seq("spark", "sql"))).as("mentions_engine"),
        size(array_distinct(toks)).as("n_distinct"),
        size(array_intersect(toks, typedLit(Seq("the", "a", "of")))).as("n_articles"),
        element_at(toks, 1).as("first_tok"),
        element_at(toks, -1).as("last_tok"),
        array_join(slice(toks, 1, 3), ",").as("first3"))
      .orderBy("doc_id")
  }

  /** Higher-order-function battery (transform / filter / exists / forall
    * / aggregate) — the expression-level lambda surface. Correct and
    * concise; NOTE these run interpreted (see BASELINE/SCALING: hot
    * paths promote to codegen expressions like VectorDot). */
  def qLambdaBattery(s: SparkSession, d: String): DataFrame = {
    val toks = TextStats.tokens(col("text"))
    t(s, d, "documents").filter(col("doc_id") < lit(50L))
      .select(col("doc_id"),
        array_join(transform(toks, t => length(t).cast("string")), ",").as("tok_lens"),
        size(filter(toks, t => length(t) > lit(4))).as("n_long"),
        exists(toks, t => t === lit("data")).as("has_data"),
        forall(toks, t => length(t) < lit(20)).as("all_short"),
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("total_chars"))
      .orderBy("doc_id")
  }

  /** Recursive CTE date spine + gap-fill: every calendar day in Q1 1995
    * with its order count, INCLUDING zero-order days — the classic
    * time-series completeness fix (a groupBy alone silently drops empty
    * days). */
  def qDateSpine(s: SparkSession, d: String): DataFrame = {
    viewed(s, d, "orders")
    s.sql("""
      |WITH RECURSIVE cal(day) AS (
      |  SELECT DATE '1995-01-01'
      |  UNION ALL SELECT date_add(day, 1) FROM cal WHERE day < DATE '1995-03-31'
      |)
      |SELECT cal.day, count(o_orderkey) AS n_orders
      |FROM cal LEFT JOIN orders ON CAST(o_orderdate AS DATE) = cal.day
      |GROUP BY cal.day ORDER BY cal.day""".stripMargin)
  }

  /** Inline VALUES dimension + non-equi band join: customers bucketed
    * into balance tiers by BETWEEN bounds (broadcast — a band join
    * against a tiny tier table never needs a shuffle). */
  def qBandJoin(s: SparkSession, d: String): DataFrame = {
    viewed(s, d, "customer")
    s.sql("""
      |SELECT t.tier, count(*) AS n_customers,
      |       CAST(min(c_custkey) AS BIGINT) AS sample_key
      |FROM customer
      |JOIN (VALUES ('low', -99999.0, 1000.0),
      |             ('mid', 1000.0, 5000.0),
      |             ('high', 5000.0, 99999.0)) AS t(tier, lo, hi)
      |  ON c_acctbal >= t.lo AND c_acctbal < t.hi
      |GROUP BY t.tier ORDER BY t.tier""".stripMargin)
  }

  /** Percent-of-total via a partition-window sum: each nation's share of
    * its region's revenue (the standard reporting ratio). */
  def qPercentOfTotal(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(Q.dsum(Q.revenue).as("revenue"))
    val w = Window.partitionBy(col("r_name"))
    base.withColumn("region_total",
        sum(col("revenue").cast(org.apache.spark.sql.types.DecimalType(30, 8)))
          .over(w).cast("double"))
      .withColumn("share", round(col("revenue") / col("region_total"), 6))
      .select(col("r_name"), col("n_name"), col("revenue"), col("share"))
      .orderBy("r_name", "n_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_source_exclusive_bigrams" -> qSourceExclusiveBigrams,
    "q_cross_lang_dups" -> qCrossLangDups,
    "q_band_join"       -> qBandJoin,
    "q_percent_of_total"-> qPercentOfTotal,
    "q_date_spine"      -> qDateSpine,
    "q_array_battery"   -> qArrayBattery,
    "q_lambda_battery"  -> qLambdaBattery,
    "q_scalar_subquery" -> qScalarSubquery,
    "q_range_frame"     -> qRangeFrame,
    "q_lateral"         -> qLateral,
    "q_bigrams"         -> qBigrams,
    "q_repetition"      -> qRepetition,
    "q_source_stats"    -> qSourceStats,
    "q_string_battery"  -> qStringBattery,
    "q_report"          -> qReport,
    "q_profile_orders"  -> qProfileOrders,
    "q_math_battery"    -> qMathBattery,
    "q_bit_battery"     -> qBitBattery,
    "q_token_histogram" -> qTokenHistogram)

  private def PROFILE_COL(c: String, minmax: String => String): String =
    s"""SELECT '$c' AS col_name, count(*) AS n,
       |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       |  count(DISTINCT $c) AS n_distinct,
       |  ${minmax(s"min($c)")} AS min_value, ${minmax(s"max($c)")} AS max_value
       |FROM orders""".stripMargin

  private val asStr = (e: String) => s"CAST($e AS VARCHAR)"
  private val asNum = (e: String) => s"printf('%.4f', $e)"
  private val asTs  = (e: String) => s"strftime($e, '%Y-%m-%d %H:%M:%S')"

  private val TOKS = TextStats.TOKENS("text")

  val oracles: Map[String, String] = Map(
    "q_source_exclusive_bigrams" ->
      s"""WITH x AS (
         |  SELECT DISTINCT source,
         |    unnest(${graft.text.Dedup.SHINGLES("text", 2)}) AS bigram
         |  FROM documents),
         |excl AS (
         |  SELECT bigram, count(DISTINCT source) AS n_sources,
         |         min(source) AS only_source
         |  FROM x GROUP BY bigram HAVING count(DISTINCT source) = 1)
         |SELECT only_source AS source, count(*) AS n_exclusive_bigrams
         |FROM excl GROUP BY 1 ORDER BY source""".stripMargin,
    "q_cross_lang_dups" ->
      s"""WITH sh AS (
         |  SELECT doc_id, ${graft.text.Dedup.SHINGLES("text")} AS s FROM documents
         |), x AS (SELECT doc_id, unnest(s) AS g FROM sh),
         |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
         |      FROM x a JOIN x b ON a.g = b.g AND a.doc_id < b.doc_id
         |      GROUP BY 1, 2),
         |jac AS (
         |  SELECT doc_a, doc_b,
         |         round(common / (la.n + lb.n - common), 6) AS jaccard
         |  FROM p JOIN sizes la ON la.doc_id = doc_a
         |         JOIN sizes lb ON lb.doc_id = doc_b
         |  WHERE common / (la.n + lb.n - common) >= 0.5)
         |SELECT doc_a, doc_b, da.lang AS lang_a, db.lang AS lang_b, jaccard
         |FROM jac JOIN documents da ON da.doc_id = doc_a
         |         JOIN documents db ON db.doc_id = doc_b
         |WHERE da.lang <> db.lang
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q_band_join" ->
      """SELECT t.tier, count(*) AS n_customers,
        |       CAST(min(c_custkey) AS BIGINT) AS sample_key
        |FROM customer
        |JOIN (VALUES ('low', -99999.0, 1000.0),
        |             ('mid', 1000.0, 5000.0),
        |             ('high', 5000.0, 99999.0)) AS t(tier, lo, hi)
        |  ON c_acctbal >= t.lo AND c_acctbal < t.hi
        |GROUP BY t.tier ORDER BY t.tier""".stripMargin,
    "q_percent_of_total" ->
      s"""WITH base AS (
         |  SELECT r_name, n_name, ${Q.DSUM(Q.REVENUE)} AS revenue
         |  FROM lineitem
         |  JOIN orders   ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation   ON c_nationkey = n_nationkey
         |  JOIN region   ON n_regionkey = r_regionkey
         |  GROUP BY r_name, n_name)
         |SELECT r_name, n_name, revenue,
         |  round(revenue / CAST(CAST(sum(CAST(revenue AS DECIMAL(30,8))) OVER (PARTITION BY r_name) AS VARCHAR) AS DOUBLE), 6) AS share
         |FROM base ORDER BY r_name, n_name""".stripMargin,
    "q_date_spine" ->
      """WITH RECURSIVE cal(day) AS (
        |  SELECT DATE '1995-01-01'
        |  UNION ALL SELECT CAST(day + INTERVAL 1 DAY AS DATE) FROM cal WHERE day < DATE '1995-03-31'
        |)
        |SELECT cal.day, count(o_orderkey) AS n_orders
        |FROM cal LEFT JOIN orders ON CAST(o_orderdate AS DATE) = cal.day
        |GROUP BY cal.day ORDER BY cal.day""".stripMargin,
    "q_array_battery" ->
      s"""SELECT doc_id,
         |  CAST(len($TOKS) AS INTEGER) AS n,
         |  list_contains($TOKS, 'data') AS has_data,
         |  list_has_any($TOKS, ['spark', 'sql']) AS mentions_engine,
         |  CAST(len(list_distinct($TOKS)) AS INTEGER) AS n_distinct,
         |  CAST(len(list_intersect($TOKS, ['the', 'a', 'of'])) AS INTEGER) AS n_articles,
         |  $TOKS[1] AS first_tok,
         |  $TOKS[-1] AS last_tok,
         |  array_to_string($TOKS[1:3], ',') AS first3
         |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin,
    "q_lambda_battery" ->
      s"""SELECT doc_id,
         |  array_to_string(list_transform($TOKS, t -> CAST(length(t) AS VARCHAR)), ',') AS tok_lens,
         |  CAST(len(list_filter($TOKS, t -> length(t) > 4)) AS INTEGER) AS n_long,
         |  list_has_any(list_filter($TOKS, t -> t = 'data'), $TOKS) AS has_data,
         |  len(list_filter($TOKS, t -> length(t) >= 20)) = 0 AS all_short,
         |  CAST(list_sum(list_transform($TOKS, t -> length(t))) AS BIGINT) AS total_chars
         |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal
        |FROM customer c
        |WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.5 FROM customer
        |                   WHERE c_mktsegment = c.c_mktsegment)
        |ORDER BY c_custkey""".stripMargin,
    "q_range_frame" ->
      s"""WITH daily AS (
         |  SELECT CAST(l_shipdate AS DATE) AS day,
         |         ${Q.DSUM(Q.REVENUE)} AS price
         |  FROM lineitem GROUP BY 1)
         |SELECT day, price,
         |  round(sum(price) OVER (ORDER BY day
         |    RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW), 4) AS sum7d
         |FROM daily ORDER BY day""".stripMargin,
    "q_lateral" ->
      """SELECT segs.c_mktsegment, top.c_custkey, top.c_acctbal
        |FROM (SELECT DISTINCT c_mktsegment FROM customer) segs,
        |LATERAL (SELECT c_custkey, c_acctbal FROM customer
        |         WHERE c_mktsegment = segs.c_mktsegment
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) top
        |ORDER BY segs.c_mktsegment, top.c_acctbal DESC, top.c_custkey""".stripMargin,
    "q_bigrams" ->
      s"""WITH x AS (
         |  SELECT unnest(${graft.text.Dedup.SHINGLES("text", 2)}) AS bigram
         |  FROM documents)
         |SELECT bigram, count(*) AS n FROM x GROUP BY bigram
         |ORDER BY n DESC, bigram LIMIT 50""".stripMargin,
    "q_repetition" ->
      s"""WITH tf AS (
         |  SELECT doc_id, t.g AS tok, count(*) AS c
         |  FROM (SELECT doc_id, ${TextStats.TOKENS("text")} AS toks FROM documents) x,
         |       unnest(x.toks) AS t(g)
         |  GROUP BY doc_id, t.g)
         |SELECT doc_id,
         |  round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS repetition_ratio,
         |  max(c) AS top_token_count,
         |  CAST(sum(c) AS BIGINT) AS n_tokens
         |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_source_stats" ->
      s"""SELECT source, count(*) AS n_docs,
         |  ${Q.DSUM("CAST(n_chars AS DOUBLE)")} / count(*) AS avg_chars,
         |  count(DISTINCT lang) AS n_langs,
         |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
         |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_string_battery" ->
      """SELECT c_custkey,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
        |  rpad(c_mktsegment, 12, '.') AS padded_seg,
        |  reverse(c_name) AS rev_name,
        |  translate(c_name, '#', '-') AS dashed,
        |  repeat(substr(c_mktsegment, 1, 2), 2) AS seg2x,
        |  substr(c_name, 1, 4) AS name4,
        |  CAST(instr(c_name, '#') AS INTEGER) AS hash_pos,
        |  CAST(levenshtein(c_mktsegment, 'MACHINERY') AS INTEGER) AS lev_machinery,
        |  CAST(ascii(c_mktsegment) AS INTEGER) AS seg_ascii
        |FROM customer WHERE c_custkey < 100 ORDER BY c_custkey""".stripMargin,
    "q_report" ->
      s"""WITH daily AS (
         |  SELECT CAST(l_shipdate AS DATE) AS day, ${Q.DSUM(Q.REVENUE)} AS price
         |  FROM lineitem GROUP BY 1),
         |rets AS (
         |  SELECT day, price,
         |    (price / NULLIF(lag(price) OVER (ORDER BY day), 0) - 1) * 100 AS ret
         |  FROM daily
         |  WHERE day BETWEEN DATE '${CoreQueries.from}' AND DATE '${CoreQueries.to}')
         |SELECT strftime(min(day), '%d/%m/%Y') AS period_start,
         |  strftime(max(day), '%d/%m/%Y') AS period_end,
         |  count(*) AS n_days,
         |  printf('%.2f', avg(ret)) AS media_ret_fmt,
         |  printf('%.2f', ${Q.DSUM("price")} / 1000000.0) AS total_revenue_mm
         |FROM rets""".stripMargin,
    "q_profile_orders" ->
      (Seq(
        PROFILE_COL("o_orderkey", asStr),
        PROFILE_COL("o_custkey", asStr),
        PROFILE_COL("o_orderstatus", asStr),
        PROFILE_COL("o_totalprice", asNum),
        PROFILE_COL("o_orderdate", asTs),
        PROFILE_COL("o_orderpriority", asStr)).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")),
    "q_math_battery" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(ln(l_extendedprice), 6) AS ln_price,
        |  round(log10(l_extendedprice), 6) AS log10_price,
        |  round(exp(l_discount), 6) AS exp_disc,
        |  round(pow(l_quantity, 2.0), 6) AS qty_sq,
        |  round(sin(l_discount), 6) AS sin_disc,
        |  round(cos(l_discount), 6) AS cos_disc,
        |  round(atan(l_tax), 6) AS atan_tax,
        |  CAST(sign(l_quantity - 25.0) AS DOUBLE) AS sign_qty
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_bit_battery" ->
      """SELECT p_partkey,
        |  p_partkey & 255 AS and255,
        |  p_partkey | 4096 AS or4096,
        |  xor(p_partkey, 170) AS xor170,
        |  p_partkey << 2 AS shl2,
        |  p_partkey >> 1 AS shr1,
        |  CAST(bit_count(p_partkey) AS INTEGER) AS popcount
        |FROM part WHERE p_partkey < 100 ORDER BY p_partkey""".stripMargin,
    "q_token_histogram" ->
      s"""SELECT CAST(floor(len(${TextStats.TOKENS("text")}) / 50) * 50 AS BIGINT) AS bucket,
         |  count(*) AS n_docs
         |FROM documents GROUP BY bucket ORDER BY bucket""".stripMargin)
}
