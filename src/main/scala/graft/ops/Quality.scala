package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Q

/** Data-quality constraint audit (the Deequ/Great-Expectations shape):
  * declarative checks over a table, evaluated in as few passes as the
  * checks allow, emitting one (check, metric, ok) row each — the
  * pre-flight gate a production pipeline runs before publishing a
  * batch, and the shape monitoring systems scrape.
  *
  * Scale design: every SCALAR check (completeness, uniqueness, range,
  * set membership, freshness) folds into ONE aggregate pass over one
  * scan — adding a check adds an aggregate expression, not a scan;
  * the referential check is the only join (an anti-join on the FK,
  * equi-keyed, broadcast when the dimension allows). Metrics are
  * exact counts/ratios (count ratios divide exactly in double), so
  * the audit is oracle-replayable — no sampling, no sketches. */
object Quality {

  /** The orders-table audit used by `q_data_quality`: six checks, one
    * aggregate pass + one FK anti-join against customer. */
  def ordersAudit(orders: DataFrame, customer: DataFrame): DataFrame = {
    val agg = orders.agg(
      count(lit(1)).as("n_rows"),
      count(col("o_custkey")).as("n_custkey"),
      countDistinct(col("o_orderkey")).as("n_distinct_key"),
      min(col("o_totalprice")).as("min_price"),
      sum((!col("o_orderstatus").isin("O", "F", "P")).cast("long"))
        .as("n_bad_status"),
      max(col("o_orderdate").cast("date").cast("string")).as("max_date"))
    // NULL keys are a COMPLETENESS defect, not an FK defect — exclude
    // them here (they would null the join condition and count as
    // orphans), matching the oracle's IS NOT NULL guard
    val fkViolations = orders.select(col("o_custkey"))
      .filter(col("o_custkey").isNotNull)
      .join(customer.select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    // six (check, metric, ok) rows from the two 1-row frames; the
    // cross is the allowlisted single-row-broadcast shape
    agg.crossJoin(broadcast(fkViolations)).select(
      expr("""stack(6,
        'completeness_custkey', n_custkey / CAST(n_rows AS DOUBLE),
          CAST(n_custkey = n_rows AS INT),
        'fk_custkey_in_customer', CAST(n_orphans AS DOUBLE),
          CAST(n_orphans = 0 AS INT),
        'freshness_orderdate', CAST(substring(max_date, 1, 4) AS DOUBLE),
          CAST(max_date >= '1999-01-01' AS INT),
        'range_totalprice_positive', min_price,
          CAST(min_price > 0.0 AS INT),
        'set_orderstatus', CAST(n_bad_status AS DOUBLE),
          CAST(n_bad_status = 0 AS INT),
        'unique_orderkey', n_distinct_key / CAST(n_rows AS DOUBLE),
          CAST(n_distinct_key = n_rows AS INT)
        ) AS (check, metric, ok)"""))
      .withColumn("metric", round(col("metric"), 6))
      .orderBy("check")
  }

  /** DuckDB twin of [[ordersAudit]]. */
  val ORDERS_AUDIT_SQL: String =
    """WITH a AS (
      |  SELECT count(*) AS n_rows,
      |         count(o_custkey) AS n_custkey,
      |         count(DISTINCT o_orderkey) AS n_distinct_key,
      |         min(o_totalprice) AS min_price,
      |         sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
      |                  THEN 1 ELSE 0 END) AS n_bad_status,
      |         max(strftime(o_orderdate, '%Y-%m-%d')) AS max_date
      |  FROM orders),
      |fk AS (
      |  SELECT count(*) AS n_orphans FROM orders
      |  WHERE o_custkey IS NOT NULL AND o_custkey NOT IN
      |        (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL)),
      |checks AS (
      |  SELECT 'completeness_custkey' AS "check",
      |         n_custkey / CAST(n_rows AS DOUBLE) AS metric,
      |         CAST(n_custkey = n_rows AS INTEGER) AS ok FROM a
      |  UNION ALL
      |  SELECT 'fk_custkey_in_customer', CAST(n_orphans AS DOUBLE),
      |         CAST(n_orphans = 0 AS INTEGER) FROM fk
      |  UNION ALL
      |  SELECT 'freshness_orderdate',
      |         CAST(substring(max_date, 1, 4) AS DOUBLE),
      |         CAST(max_date >= '1999-01-01' AS INTEGER) FROM a
      |  UNION ALL
      |  SELECT 'range_totalprice_positive', min_price,
      |         CAST(min_price > 0.0 AS INTEGER) FROM a
      |  UNION ALL
      |  SELECT 'set_orderstatus', CAST(n_bad_status AS DOUBLE),
      |         CAST(n_bad_status = 0 AS INTEGER) FROM a
      |  UNION ALL
      |  SELECT 'unique_orderkey',
      |         n_distinct_key / CAST(n_rows AS DOUBLE),
      |         CAST(n_distinct_key = n_rows AS INTEGER) FROM a)
      |SELECT "check", round(metric, 6) AS metric, ok
      |FROM checks ORDER BY "check"""".stripMargin
}
