package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The cross-engine-critical numeric plumbing shared by the in-plan
  * models ([[LangId]], [[Dsir]]) — hoisted so the bit-identity
  * contract has exactly ONE implementation per engine:
  *
  *  - [[q6]]/[[Q6]]: log-prob → 1e-6 integer grid
  *    (`floor(x·1e6 + 0.5)` as BIGINT). Scores summed on this grid
  *    are EXACT integer arithmetic — bit-identical across engines,
  *    layouts, and AQE replans; the only float step is `ln` itself,
  *    and the grid keeps a 2-ulp `ln` disagreement ~1e9× away from a
  *    rounding boundary (the `q_lm_score` budget argument).
  *  - [[bucket]]/`md5_number_upper(e) % n` (DuckDB side): hash bucket
  *    as the LOW bits of the cross-engine md5-64 little-endian
  *    assembly — byte 0 is the LEAST-significant byte, so under a
  *    power-of-two mask only hex chars 1–4 participate: two `conv`
  *    calls instead of eight for the identical value (bit-equality
  *    pinned by `LangIdSpec`).
  */
object Quantize {

  /** log-prob → 1e-6 integer grid (exact-integer scoring unit). */
  def q6(c: Column): Column =
    floor(c * lit(1e6) + lit(0.5)).cast(LongType)

  /** DuckDB twin of [[q6]]. */
  def Q6(e: String): String =
    s"CAST(floor(($e) * 1e6 + 0.5) AS BIGINT)"

  /** Low bits of the cross-engine md5-64 for a power-of-two bucket
    * count (≤ 65536 — two little-endian bytes). DuckDB twin:
    * `md5_number_upper(e) % buckets`. */
  def bucket(e: Column, buckets: Int): Column = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0 &&
      buckets <= 65536, s"buckets must be a power of two <= 65536: $buckets")
    val hex = md5(e)
    (conv(substring(hex, 1, 2), 16, 10).cast(LongType) bitwiseOR
      shiftleft(conv(substring(hex, 3, 2), 16, 10).cast(LongType), 8))
      .bitwiseAND(lit((buckets - 1).toLong))
  }
}
