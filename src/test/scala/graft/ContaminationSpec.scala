package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.text.Contamination

/** Benchmark-decontamination operator: containment semantics (probe-
  * side denominator), the clean() anti-join, and the broadcast plan
  * shape that makes the check map-side at scale. */
class ContaminationSpec extends SparkSuite {

  import spark.implicits._

  // a probe "benchmark question" and train docs around it
  private val probeText = "alpha beta gamma delta epsilon zeta eta theta"
  private def trainDocs = Seq(
    // 1: the probe text verbatim inside a longer document — the classic
    // leak: tiny Jaccard vs the long doc, full containment
    (1L, "one two three four five six seven eight nine ten " + probeText +
      " eleven twelve thirteen fourteen fifteen sixteen"),
    (2L, "totally unrelated words that share nothing with the benchmark " +
      "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"),
    // 3: exactly half of the probe's 6 shingles (first 5 tokens = 3 shingles)
    (3L, "alpha beta gamma delta epsilon padding more padding here now")
  ).toDF("doc_id", "text")

  private def probeDocs = Seq((100L, probeText)).toDF("doc_id", "text")

  test("containment flags the embedded leak, not the unrelated doc; half-overlap sits on the gate") {
    val out = Contamination.overlap(trainDocs, probeDocs, 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    // probe has 8 tokens -> 6 distinct shingles; doc 1 contains all 6
    assert(out.contains(1L) && out(1L) == ((6L, 1.0)), s"got $out")
    // doc 3 has shingles of the probe's first 5 tokens: 3 of 6 = exactly 0.5
    assert(out.contains(3L) && out(3L) == ((3L, 0.5)), s"got $out")
    assert(!out.contains(2L), "unrelated doc must not flag")
    // raising the gate above 0.5 drops the boundary doc but keeps the leak
    val strict = Contamination.overlap(trainDocs, probeDocs, 0.6)
      .collect().map(_.getLong(0)).toSet
    assert(strict == Set(1L))
  }

  test("clean() is the complement of the flagged ids") {
    val kept = Contamination.clean(trainDocs, probeDocs, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L))
    // with no probes nothing flags
    val none = Contamination.clean(trainDocs, probeDocs.limit(0), 0.5)
    assert(none.count() == 3)
  }

  test("overlap joins broadcast the probe side (map-side at scale)") {
    val plan = Contamination.overlap(trainDocs, probeDocs, 0.5)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastHashJoin"),
      "probe shingles must broadcast:\n" + plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("registry split: probe and train partition the corpus") {
    val d = sf("sf0.001")
    val docs = graft.io.Tables.load(spark, d, "documents")
    val n = docs.count()
    val p = docs.filter(col("doc_id") % 11 === 0).count()
    val t = docs.filter(col("doc_id") % 11 =!= 0).count()
    assert(p + t == n && p > 0 && t > 0)
  }
}
