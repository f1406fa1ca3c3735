package graft

import graft.queries.Wave24Queries

/** Wave-24: incremental signature maintenance from the CDC feed. */
class Wave24Spec extends SparkSuite {

  test("incremental signature table equals the full recompute per " +
      "source, and genuinely carries most docs by reference") {
    val rows = Wave24Queries.qIncrSigs(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(6) === 1, s"maintenance diverged for ${r.getString(0)}")
      assert(r.getLong(2) + r.getLong(3) === r.getLong(1),
        "carried + recomputed must partition the snapshot")
    }
    val carried = rows.map(_.getLong(2)).sum
    val recomputed = rows.map(_.getLong(3)).sum
    assert(carried > 0 && recomputed > 0,
      "the merge must produce both carried and recomputed docs")
    // the whole point: the incremental path re-pays the expensive
    // tokenize+hash for only the changed sliver
    assert(carried >= recomputed / 2,
      s"carried $carried vs recomputed $recomputed")
  }
}
