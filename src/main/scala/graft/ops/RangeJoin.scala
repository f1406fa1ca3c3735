package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: pair left rows with right rows whose timestamp
  * falls in `[leftTime + lower, leftTime + upper)`, optionally per key.
  *
  * A naive inequality join is a BroadcastNestedLoopJoin — O(|L|·|R|) and
  * the classic 100 TB killer. This implementation BUCKETIZES time into
  * `upper − lower`-wide buckets: each left row is exploded into the ≤2
  * buckets its window can touch, the right side is keyed by its single
  * bucket, and the pair space collapses to an equi-join on
  * (keys, bucket) + an exact residual filter. Shuffle is linear in rows;
  * a hot key can further be salted (ops.Scale).
  */
object RangeJoin {

  /** @param lowerSec window start offset (seconds, inclusive, may be negative)
    * @param upperSec window end offset (seconds, exclusive, > lowerSec) */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftTime: String, rightTime: String,
                   lowerSec: Long, upperSec: Long,
                   keys: Seq[String]): DataFrame = {
    require(upperSec > lowerSec, "empty interval")
    val spanMicros = (upperSec - lowerSec) * 1000000L
    // integral DIV — epoch micros (~1.7e18) lose precision in a double,
    // which would misbucket rows near boundaries
    def bucketOf(t: Column, offset: Long) =
      call_function("div", unix_micros(t) + lit(offset * 1000000L), lit(spanMicros))

    // left window [t+lower, t+upper) spans at most 2 buckets of width span
    val l = left
      .withColumn("_b", explode(array_distinct(array(
        bucketOf(col(leftTime), lowerSec), bucketOf(col(leftTime), upperSec)))))
    val r = right.withColumn("_b", bucketOf(col(rightTime), 0L))

    l.join(r, keys :+ "_b")
      .filter(col(rightTime) >= col(leftTime) + expr(s"INTERVAL $lowerSec SECONDS") &&
              col(rightTime) <  col(leftTime) + expr(s"INTERVAL $upperSec SECONDS"))
      .drop("_b")
  }
}
