package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.text.TextStats

/** Third breadth wave: recognizable TPC-H shapes (Q3/Q6/Q10 adapted to
  * the driver schema), the remaining window functions (ntile,
  * percent_rank, cume_dist, first/last/nth_value), unpivot (melt),
  * posexplode with position semantics, string aggregation, NULL-handling
  * battery, and winnowing (rolling min-hash) document fingerprints.
  */
object Wave3Queries {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** TPC-H Q3 (shipping priority): top 10 undelivered orders by revenue
    * for one segment. */
  def qTpchQ3(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").filter(col("l_shipdate") > lit("1996-03-15"))
      .join(t(s, d, "orders").filter(col("o_orderdate") < lit("1996-03-15")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, d, "customer")
          .filter(col("c_mktsegment") === lit("BUILDING"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
               date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
               col("o_orderpriority"))
      .agg(Q.dsum(Q.revenue).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  /** TPC-H Q6 (forecast revenue change): single filtered grand sum. */
  def qTpchQ6(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
              col("l_shipdate") < lit("1997-01-01") &&
              col("l_discount").between(0.03, 0.07) &&
              col("l_quantity") < lit(24.0))
      .agg(Q.dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
           count(lit(1)).as("n"))

  /** TPC-H Q5 (local supplier volume): revenue per nation where the
    * customer and the supplier share the nation — the classic 6-table
    * snowflake with a fact-fact shuffle core (lineitem⋈orders on
    * orderkey, then custkey/suppkey) and broadcast leaves for the tiny
    * nation/region dims. customer and supplier stay on the shuffle
    * path: both grow linearly with SF (at 100 TB neither is
    * broadcastable), and the c_nationkey = s_nationkey cross-filter
    * rides the supplier join as a residual condition. */
  def qTpchQ5(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .join(t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
                  col("o_orderdate") < lit("1997-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, d, "supplier"),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t(s, d, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")
          .filter(col("r_name") === lit("ASIA"))),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(Q.dsum(Q.revenue).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))

  /** TPC-H Q17 (small-quantity-order revenue): parts of one brand below
    * a size cut, lineitems under 20% of that part's average quantity.
    * The correlated scalar subquery decorrelates into a per-part
    * aggregate joined back on partkey — one extra uniform-key shuffle
    * instead of a per-row probe; the threshold is derived with the
    * exact decimal sum so the < comparison lands identically in both
    * engines. */
  def qTpchQ17(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    val parts = t(s, d, "part")
      .filter(col("p_brand") === lit("Brand#23") && col("p_size") < lit(15))
      .select(col("p_partkey"))
    val avgQty = li.groupBy(col("l_partkey").as("t_partkey"))
      .agg((lit(0.2) * (Q.dsum(col("l_quantity")) / count(col("l_quantity"))))
        .as("qty_cut"))
    li.join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(avgQty, col("l_partkey") === col("t_partkey"))
      .filter(col("l_quantity") < col("qty_cut"))
      .agg((Q.dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q12 shape (shipping-delay priority split): per linestatus,
    * how many late-shipped lines (> 30 days after the order date)
    * carry high vs low order priority — the fact-fact join with
    * conditional aggregation. Adapted to this schema: l_shipmode /
    * commitdate don't exist here, so linestatus is the dimension and
    * the lateness predicate derives from shipdate − orderdate. */
  def qTpchQ12(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(datediff(col("l_shipdate"), col("o_orderdate")) > 30)
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("l_linestatus")

  /** TPC-H Q14 (promotion effect): PROMO-part share of one month's
    * revenue — the conditional-sum ratio over a fact×dim join; the
    * part side broadcasts at test SFs and shuffles at scale (AQE's
    * call, not hinted). Both sums are decimal-exact so the ratio is
    * engine-identical before rounding. */
  def qTpchQ14(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-09-01") &&
        col("l_shipdate") < lit("1996-10-01"))
      .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
      .agg(
        round(lit(100.0)
          * Q.dsum(when(col("p_type") === "PROMO", Q.revenue)
            .otherwise(lit(0.0)))
          / Q.dsum(Q.revenue), 6).as("promo_revenue_pct"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q19 shape (discounted revenue under a disjunction of
    * conjunctive brand/size/quantity bands): the OR-of-ANDs predicate
    * that exercises predicate normalization — each disjunct pairs a
    * part filter with a lineitem quantity band, and the join must not
    * degrade to a cartesian when the predicate mixes both sides. */
  def qTpchQ19(s: SparkSession, d: String): DataFrame = {
    val joined = t(s, d, "lineitem")
      .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
    joined.filter(
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30)))
      .agg(Q.dsum(Q.revenue).as("revenue"), count(lit(1)).as("n_items"))
  }

  /** TPC-H Q10 (returned items): top 20 customers by lost revenue. */
  def qTpchQ10(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").filter(col("l_returnflag") === lit("R"))
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(Q.dsum(Q.revenue).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** Remaining analytic window functions, unique-key tiebreaks. */
  def qWindowExtras(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, d, "orders").filter(col("o_orderkey") < lit(500L))
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        first_value(col("o_orderkey")).over(full).as("cheapest"),
        last_value(col("o_orderkey")).over(full).as("priciest"),
        nth_value(col("o_orderkey"), 2).over(full).as("second_cheapest"))
      .orderBy("o_orderpriority", "o_totalprice", "o_orderkey")
  }

  /** Unpivot (melt): wide per-flag measures → long (measure, value). */
  def qUnpivot(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(Q.dsum(col("l_quantity")).as("qty"),
           Q.dsum(col("l_extendedprice")).as("price"),
           Q.dsum(col("l_discount")).as("disc"))
      .unpivot(Array(col("l_returnflag")),
               Array(col("qty"), col("price"), col("disc")),
               "measure", "value")
      .orderBy("l_returnflag", "measure")

  /** posexplode with position semantics: token frequency + first
    * position within document. */
  def qTokenExplode(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").filter(col("doc_id") < lit(20L))
      .select(col("doc_id"), posexplode(TextStats.tokens(col("text"))).as(Seq("pos", "token")))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("n"), (min(col("pos")) + lit(1)).cast("long").as("first_pos"))
      .orderBy("doc_id", "token")

  /** String aggregation (ordered distinct concat). */
  def qStringAgg(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(concat_ws(",", sort_array(collect_set(col("o_orderstatus")))).as("statuses"),
           countDistinct(col("o_orderstatus")).as("n_statuses"))
      .orderBy("o_orderpriority")

  /** NULL-handling battery over a left join (real NULLs from no-order
    * customers). */
  def qNullBattery(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(max(col("o_totalprice")).as("max_price"))
      .select(col("c_custkey"),
        coalesce(col("max_price"), lit(-1.0)).as("price_or_default"),
        col("max_price").isNull.as("has_no_orders"),
        nullif(coalesce(col("max_price"), lit(0.0)), lit(0.0)).isNull.as("zero_or_null"),
        when(col("max_price").isNull, lit("none"))
          .when(col("max_price") > 300000, lit("big")).otherwise(lit("small")).as("bucket"))
      .orderBy("c_custkey")

  /** Winnowing fingerprints (rolling window of shingle hashes, min per
    * window, distinct). r2: hashes are the md5-derived cross-engine
    * value shifted to 60 bits — unsigned-shift so BOTH engines compare
    * the same positive range (signed vs UBIGINT min would disagree on
    * top-bit values) — which upgrades this from rows-only to a full
    * DuckDB oracle recomputing the winnow from scratch.
    *
    * Shape matters: the hash runs per exploded ROW (codegen projection
    * with subexpression elimination — md5 once per shingle), NOT inside
    * an array lambda, where interpreted HOF evaluation re-derives the
    * tokenization and md5 for EVERY term of the 8-byte assembly per
    * element (measured minutes of single-core work at sf0.1 — AQE
    * coalesces the tiny post-shuffle partitions to one task). The
    * ordered per-doc hash array is reassembled with a positional
    * collect; the remaining lambdas only slice/min small long arrays. */
  def qWinnow(s: SparkSession, d: String): DataFrame = {
    val toks = TextStats.tokens(col("text"))
    val shingleArr = transform(
      sequence(lit(0), greatest(size(toks) - lit(3), lit(-1))),
      i => concat_ws(" ", slice(toks, i + lit(1), lit(3))))
    val rows = t(s, d, "documents").repartition(col("doc_id"))
      .select(col("doc_id"), posexplode(shingleArr).as(Seq("pos", "shingle")))
      .select(col("doc_id"), col("pos"),
        shiftrightunsigned(graft.text.Dedup.md5Hash64(col("shingle")), 4).as("h"))
    val hs = transform(
      array_sort(collect_list(struct(col("pos"), col("h")))),
      e => e.getField("h"))
    val wmins = transform(
      sequence(lit(0), greatest(size(col("hs")) - lit(4), lit(-1))),
      i => array_min(slice(col("hs"), i + lit(1), lit(4))))
    rows.groupBy("doc_id").agg(hs.as("hs"))
      .select(col("doc_id"), array_distinct(wmins).as("fp"))
      .select(col("doc_id"), size(col("fp")).as("n_fingerprints"),
              array_min(col("fp")).as("min_fp"), array_max(col("fp")).as("max_fp"))
      .orderBy("doc_id")
  }

  /** Bucketized range join (ops.RangeJoin): for every error event, how
    * many click/view events the same user produced in the 10 preceding
    * minutes. Left join semantics restored by re-joining the error list
    * (errors with no prior activity → 0). */
  def qRangeJoin(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
    val errors = ev.filter(col("event_type") === lit("error"))
      .select(col("event_id"), col("user_id"), col("ts"))
    val activity = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("ts").as("v_ts"), col("event_id").as("v_id"))
    val matched = graft.ops.RangeJoin.intervalJoin(
        errors, activity, "ts", "v_ts", -600L, 0L, keys = Seq("user_id"))
      .groupBy(col("event_id")).agg(count(col("v_id")).as("n_prior"))
    errors.select(col("event_id"))
      .join(matched, Seq("event_id"), "left")
      .select(col("event_id"), coalesce(col("n_prior"), lit(0L)).as("n_prior"))
      .orderBy("event_id")
  }

  /** TPC-H Q15 shape: top supplier(s) by 1996 revenue (ties kept via
    * max-subquery, classic formulation). */
  def qTopSupplier(s: SparkSession, d: String): DataFrame = {
    val rev = t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
              col("l_shipdate") < lit("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(Q.dsum(Q.revenue).as("total_revenue"))
    // global-max filter stays IN the plan (no eager .first() action):
    // rank() over the empty partition keeps ties, like Q15's subquery
    val w = Window.orderBy(col("total_revenue").desc)
    rev.withColumn("rk", rank().over(w)).filter(col("rk") === 1).drop("rk")
      .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q16 shape: parts with no shipment in 1995 H1, counted by
    * brand (anti-join against a filtered fact slice). */
  def qUnsoldParts(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .join(t(s, d, "lineitem")
          .filter(col("l_shipdate") < lit("1995-07-01"))
          .select(col("l_partkey")).distinct(),
        col("p_partkey") === col("l_partkey"), "left_anti")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_unsold"))
      .orderBy("p_brand")

  /** TPC-H Q18 shape: large-volume orders (order-level qty over a
    * threshold), with customer attribution. */
  def qLargeOrders(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > lit(300.0))
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("l_orderkey"),
              col("o_totalprice"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("l_orderkey"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_top_supplier"  -> qTopSupplier,
    "q_unsold_parts"  -> qUnsoldParts,
    "q_large_orders"  -> qLargeOrders,
    "q_range_join"    -> qRangeJoin,
    "q_tpch_q3"       -> qTpchQ3,
    "q_tpch_q5"       -> qTpchQ5,
    "q_tpch_q6"       -> qTpchQ6,
    "q_tpch_q10"      -> qTpchQ10,
    "q_tpch_q12"      -> qTpchQ12,
    "q_tpch_q14"      -> qTpchQ14,
    "q_tpch_q17"      -> qTpchQ17,
    "q_tpch_q19"      -> qTpchQ19,
    "q_window_extras" -> qWindowExtras,
    "q_unpivot"       -> qUnpivot,
    "q_token_explode" -> qTokenExplode,
    "q_string_agg"    -> qStringAgg,
    "q_null_battery"  -> qNullBattery,
    "q_winnow"        -> qWinnow)

  private val WINNOW_SQL = {
    val T = TextStats.TOKENS("text")
    s"""WITH t AS (SELECT doc_id, $T AS toks FROM documents),
       |sh AS (
       |  SELECT doc_id, list_transform(range(greatest(len(toks) - 2, 0)),
       |    i -> array_to_string(toks[i+1:i+3], ' ')) AS shingles FROM t),
       |h AS (
       |  SELECT doc_id, list_transform(shingles,
       |    s -> md5_number_upper(s) >> 4) AS hs FROM sh),
       |w AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    range(greatest(len(hs) - 3, 0)),
       |    i -> list_min(hs[i+1:i+4]))) AS fp FROM h)
       |SELECT doc_id, CAST(len(fp) AS INTEGER) AS n_fingerprints,
       |  CAST(list_min(fp) AS BIGINT) AS min_fp,
       |  CAST(list_max(fp) AS BIGINT) AS max_fp
       |FROM w ORDER BY doc_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_winnow" -> WINNOW_SQL,
    "q_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, ${Q.DSUM(Q.REVENUE)} AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,
    "q_unsold_parts" ->
      """SELECT p_brand, count(*) AS n_unsold
        |FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey
        |                  AND l_shipdate < TIMESTAMP '1995-07-01 00:00:00')
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
        |SELECT c_custkey, c_name, l_orderkey, o_totalprice, total_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, l_orderkey""".stripMargin,
    "q_range_join" ->
      """SELECT e.event_id,
        |  count(v.event_id) AS n_prior
        |FROM events e
        |LEFT JOIN events v
        |  ON v.user_id = e.user_id
        | AND v.event_type IN ('click', 'view')
        | AND v.ts >= e.ts - INTERVAL 10 MINUTE
        | AND v.ts < e.ts
        |WHERE e.event_type = 'error'
        |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin,
    "q_tpch_q3" ->
      s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         |  o_orderpriority, ${Q.DSUM(Q.REVENUE)} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
         |GROUP BY l_orderkey, orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q_tpch_q5" ->
      s"""SELECT n_name, ${Q.DSUM(Q.REVENUE)} AS revenue, count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q_tpch_q6" ->
      s"""SELECT ${Q.DSUM("l_extendedprice * l_discount")} AS revenue, count(*) AS n
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.03 AND 0.07
         |  AND l_quantity < 24""".stripMargin,
    "q_tpch_q12" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE date_diff('day', o_orderdate, l_shipdate) > 30
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q_tpch_q14" ->
      s"""SELECT round(CAST(100.0 AS DOUBLE)
         |    * ${Q.DSUM(s"CASE WHEN p_type = 'PROMO' THEN ${Q.REVENUE} ELSE 0.0 END")}
         |    / ${Q.DSUM(Q.REVENUE)}, 6) AS promo_revenue_pct,
         |  count(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin,
    "q_tpch_q19" ->
      s"""SELECT ${Q.DSUM(Q.REVENUE)} AS revenue, count(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q_tpch_q17" ->
      s"""WITH pq AS (
         |  SELECT l_partkey AS t_partkey,
         |    0.2 * (${Q.DSUM("l_quantity")} / count(l_quantity)) AS qty_cut
         |  FROM lineitem GROUP BY l_partkey)
         |SELECT ${Q.DSUM("l_extendedprice")} / 7.0 AS avg_yearly,
         |  count(*) AS n_items
         |FROM lineitem
         |JOIN part ON p_partkey = l_partkey
         |JOIN pq ON t_partkey = l_partkey
         |WHERE p_brand = 'Brand#23' AND p_size < 15
         |  AND l_quantity < qty_cut""".stripMargin,
    "q_tpch_q10" ->
      s"""SELECT c_custkey, c_name, n_name,
         |  ${Q.DSUM(Q.REVENUE)} AS revenue, count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |GROUP BY c_custkey, c_name, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q_window_extras" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume,
        |  first_value(o_orderkey) OVER wf AS cheapest,
        |  last_value(o_orderkey) OVER wf AS priciest,
        |  nth_value(o_orderkey, 2) OVER wf AS second_cheapest
        |FROM orders WHERE o_orderkey < 500
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey),
        |  wf AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderpriority, o_totalprice, o_orderkey""".stripMargin,
    "q_unpivot" ->
      s"""WITH m AS (
         |  SELECT l_returnflag, ${Q.DSUM("l_quantity")} AS qty,
         |    ${Q.DSUM("l_extendedprice")} AS price, ${Q.DSUM("l_discount")} AS disc
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, measure, value FROM (
         |  SELECT l_returnflag, 'qty' AS measure, qty AS value FROM m
         |  UNION ALL SELECT l_returnflag, 'price', price FROM m
         |  UNION ALL SELECT l_returnflag, 'disc', disc FROM m)
         |ORDER BY l_returnflag, measure""".stripMargin,
    "q_token_explode" ->
      s"""WITH x AS (
         |  SELECT doc_id, ${TextStats.TOKENS("text")} AS toks FROM documents
         |  WHERE doc_id < 20)
         |SELECT doc_id, t.g AS token, count(*) AS n,
         |  CAST(list_position(any_value(toks), t.g) AS BIGINT) AS first_pos
         |FROM x, unnest(x.toks) AS t(g)
         |GROUP BY doc_id, t.g
         |ORDER BY doc_id, token""".stripMargin,
    "q_string_agg" ->
      """SELECT o_orderpriority,
        |  array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses,
        |  count(DISTINCT o_orderstatus) AS n_statuses
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_null_battery" ->
      """WITH m AS (
        |  SELECT c_custkey, max(o_totalprice) AS max_price
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |SELECT c_custkey,
        |  coalesce(max_price, -1.0) AS price_or_default,
        |  max_price IS NULL AS has_no_orders,
        |  nullif(coalesce(max_price, 0.0), 0.0) IS NULL AS zero_or_null,
        |  CASE WHEN max_price IS NULL THEN 'none'
        |       WHEN max_price > 300000 THEN 'big' ELSE 'small' END AS bucket
        |FROM m ORDER BY c_custkey""".stripMargin)
}
