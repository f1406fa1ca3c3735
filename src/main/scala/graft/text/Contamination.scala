package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data pipeline's "is any
  * eval data leaking into the training corpus?" gate (the n-gram
  * overlap check popularized by the GPT-3/PaLM training reports):
  * a train document is contaminated when it contains a large fraction
  * of some probe (benchmark/eval) document's shingles.
  *
  * Containment, not Jaccard: a 50-token eval question embedded in a
  * 10k-token train document has tiny Jaccard but full containment —
  * the probe side's shingle count is the denominator that matters.
  *
  * Scale shape: the probe corpus is small BY NATURE (benchmark suites,
  * not web crawls), so its shingle rows broadcast and the overlap join
  * is map-side against the train shingles — no shuffle of the 100 TB
  * side beyond the shingle explode, and per-shingle fan-out is bounded
  * by the probe-side document frequency. */
object Contamination {

  /** Overlap pairs: (train_id, probe_id, common, containment) for
    * every train×probe pair whose containment
    * |shingles(train) ∩ shingles(probe)| / |shingles(probe)| clears
    * `minContainment`. Shingles are [[Dedup.shingles]]' distinct
    * 3-word grams; the gate compares the RAW ratio (exact integer
    * division in double — cross-engine safe), the output rounds to
    * 6 dp. */
  def overlap(train: DataFrame, probe: DataFrame,
      minContainment: Double): DataFrame = {
    val t = Dedup.shingleRows(train)
      .select(col("doc_id").as("train_id"), col("shingle"))
    val p = Dedup.shingleRows(probe)
      .select(col("doc_id").as("probe_id"), col("shingle"))
    val psizes = p.groupBy("probe_id").agg(count(lit(1)).as("n_probe"))
    t.join(broadcast(p), "shingle")
      .groupBy("train_id", "probe_id").agg(count(lit(1)).as("common"))
      .join(broadcast(psizes), "probe_id")
      .filter(col("common") / col("n_probe") >= lit(minContainment))
      .select(col("train_id"), col("probe_id"), col("common"),
        round(col("common") / col("n_probe"), 6).as("containment"))
  }

  /** The decontaminated corpus: train documents with NO overlap pair
    * above the gate (left anti join on the flagged ids). */
  def clean(train: DataFrame, probe: DataFrame,
      minContainment: Double): DataFrame =
    train.join(
      overlap(train, probe, minContainment)
        .select(col("train_id").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
}
