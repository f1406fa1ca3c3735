package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Cross-engine numeric-determinism helpers shared by all query modules.
  *
  * Problem: a double sum is order-dependent in its last ulps, and the test
  * data's money columns sit exactly on the decimal grid (l_extendedprice
  * has 2 decimals, discount 2 → revenue terms have exactly 4), so ANY
  * fixed-point rounding of a plain double sum flips .xx5 boundaries
  * between Spark and the DuckDB oracle.
  *
  * Fix: round each per-row term to the DECIMAL(30,8) grid (per-row double
  * ops are IEEE-identical across engines, and the term's distance to a
  * grid midpoint is ~5e-9 vs ~1e-11 double error, so both engines round
  * identically), sum EXACTLY in decimal, and cast the result back to
  * double. The result is bit-identical regardless of aggregation order —
  * which also makes it stable across cluster sizes / AQE replans at 100 TB,
  * not just vs the oracle.
  */
object Q {

  /** Order-independent exact sum of a (money-like) double expression. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(30, 8))).cast(DoubleType)

  /** Spread a SMALL scan across the session's cores before a
    * compute-bound projection (hash ladders, shingling, per-token
    * scoring). The synthetic test parquet is a single row group, so
    * Spark's split planning yields ONE input partition and the map
    * stage runs on one core of 32; production inputs split into
    * thousands of partitions, and the gate on the ACTUAL partition
    * count makes this a no-op there — it never adds a shuffle to an
    * input that already parallelizes, so it is safe at 100 TB by
    * construction (the shuffle it does add is bounded by the
    * small-scan bytes that triggered it). */
  def spread(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }

  /** Order-independent average (NULLs excluded, like SQL avg). */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Order-independent sum for ARBITRARY-real double terms (not just
    * money-grid data): quantize each per-row term to an integer grid
    * with `floor(x·1e8 + 0.5)` — both engines compute the identical
    * double `x·1e8 + 0.5` and the identical floor, so the integer is
    * bit-identical WITHOUT relying on either engine's double→DECIMAL
    * cast being correctly rounded (dsum's midpoint argument only holds
    * for data already near the decimal grid) — then sum exactly in
    * integers and divide back once in double. Associative and
    * mergeable, so layout/AQE-independent at any cluster size. Used by
    * the distributed linear-algebra operators (power-iteration PCA,
    * Lloyd k-means) whose per-term values are arbitrary reals.
    * Magnitude budget: |term|·1e8·n_rows must stay < 2^63; at real
    * 100 TB row counts the long accumulator widens to DECIMAL(38,0)
    * (still exact-integer, same quantizer). */
  def gsum(c: Column): Column =
    sum(floor(c * lit(1e8) + lit(0.5)).cast(LongType)).cast(DoubleType) / lit(1e8)

  /** DuckDB-side twin of [[gsum]] (hugeint sum of the same quantized
    * integers; the cast to DOUBLE is exact below 2^53). */
  def GSUM(e: String): String =
    s"(CAST(sum(CAST(floor(($e) * 1e8 + 0.5) AS BIGINT)) AS DOUBLE) / 1e8)"

  /** DuckDB-side twin of [[dsum]].
    *
    * The decimal→double hop goes THROUGH VARCHAR: DuckDB's direct
    * DECIMAL→DOUBLE cast divides the int128 payload by 10^scale in
    * double arithmetic (not correctly rounded — off by 1 ulp at ~1e10,
    * which sf0.1 group sums reach), while string→double parsing is
    * correctly rounded in both engines, matching Spark's
    * BigDecimal.doubleValue exactly. */
  def DSUM(e: String): String =
    s"CAST(CAST(sum(CAST(($e) AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)"

  /** Spark-SQL-dialect twin of [[DSUM]] (Spark spells the string type
    * STRING, not VARCHAR) for queries whose text executes in Spark. */
  def DSUM_SPARK(e: String): String =
    s"CAST(CAST(sum(CAST(($e) AS DECIMAL(30,8))) AS STRING) AS DOUBLE)"

  /** DuckDB-side twin of [[davg]]. */
  def DAVG(e: String): String = s"(${DSUM(e)} / count($e))"

  /** The lineitem revenue term used across queries. */
  val revenue: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  val REVENUE: String = "l_extendedprice * (1 - l_discount)"

  /** Diagnostic receipt column for the lake queries' physical
    * invariants (files carried by reference, vectors intact, pruning
    * arithmetic, …). The r9 post-mortem: folding a receipt into the
    * hashed row as a bare 0/1 means one load-sensitive physical fact
    * can poison an otherwise value-exact logical answer while the
    * artifact records NOTHING about which fact flipped or by how much.
    * A receipt is therefore a string: `"ok"` when the invariant holds
    * (the oracle pins the literal), else `FAIL[<operands>]` — the red
    * row itself then carries the failing receipt's operands (counts,
    * file arithmetic), so a driver-side flake is diagnosable from
    * `CORRECTNESS_r*.json` alone, with no reproduction run needed.
    * `detail` is by-name: the operand string is only built on failure. */
  def receipt(ok: Boolean, detail: => String): String =
    if (ok) "ok" else s"FAIL[$detail]"
}
