package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash sampling — the reproducibility primitive of a
  * training-data pipeline. `df.sample()` draws from a seeded RNG whose
  * stream depends on partitioning (rerun after a repartition ⇒ a
  * different sample; no way to recompute membership from a row alone).
  * Hashing a stable KEY instead gives a sample that is (a) identical on
  * any cluster layout, (b) recomputable row-by-row by any engine —
  * md5 is bit-standard, so membership can even be checked in SQL
  * downstream — and (c) consistent across tables sharing the key (the
  * classic "sample users, keep all their events" join trick).
  *
  * The 64-bit md5-derived hash is shifted unsigned by 4 (drops the
  * sign bit, keeps 60 uniform bits) and bucketed mod `buckets`. */
object Sampling {

  /** Uniform bucket in [0, buckets) from a stable key column. */
  def hashBucket(key: Column, buckets: Int): Column =
    shiftrightunsigned(graft.text.Dedup.md5Hash64(key.cast("string")), 4) %
      lit(buckets.toLong)

  /** Keep rows whose key hashes into the first `permille` of 1000
    * buckets — a deterministic ~permille/1000 sample. */
  def deterministicSample(df: DataFrame, key: Column, permille: Int): DataFrame =
    df.filter(hashBucket(key, 1000) < lit(permille.toLong))

  /** Stratified deterministic sample: per-stratum permille rates
    * (strata absent from the map are dropped) — the `df.sampleBy`
    * analog, but reproducible on any layout/engine like
    * [[deterministicSample]]. */
  def stratifiedSample(df: DataFrame, key: Column, strata: Column,
      ratesPermille: Map[String, Int]): DataFrame = {
    val rate = ratesPermille.foldLeft(lit(0L)) { case (els, (v, p)) =>
      when(strata === lit(v), lit(p.toLong)).otherwise(els)
    }
    df.filter(hashBucket(key, 1000) < rate)
  }

  /** DuckDB twin of [[hashBucket]] (UBIGINT arithmetic; same 60-bit
    * pattern — see Dedup.MD5_HASH64). */
  def HASH_BUCKET(e: String, buckets: Int): String =
    s"((md5_number_upper(CAST($e AS VARCHAR)) >> 4) % $buckets)"
}
