package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.Wave10Queries
import graft.text.TextStats

/** Wave-10 operators: streaming MERGE sink, time travel, weighted
  * sampling, robust statistics, readability, inverted index, length
  * buckets. The DuckDB oracles carry the cross-engine value proof;
  * these specs pin the engine-side invariants the oracles can't see
  * (replay determinism, version bookkeeping, brute-force equivalence
  * on small frames). */
class Wave10Spec extends SparkSuite {

  private val d = sf("sf0.001")
  private def docs = Tables.load(spark, d, "documents")

  // ---- streaming MERGE ----

  test("stream merge: snapshot equals an independent batch replay of " +
      "last-batch-wins upsert semantics, and replays deterministically") {
    val got = Wave10Queries.qStreamMerge(spark, d).collect()
    assert(got.forall(_.getLong(3) === 4L), "init + 3 micro-batches = v4")

    // independent batch replay: winner per fp = max (batch, doc_id);
    // lake rows survive only where no stream batch matched their fp
    val all = docs.select(col("doc_id"), col("source"),
      TextStats.fingerprint(coalesce(col("text"), lit(""))).as("fp"))
    val lake = all.filter(col("doc_id") % 2 === 0)
    val odds = all.filter(col("doc_id") % 2 === 1)
      .withColumn("b", col("doc_id") % 3)
    val w = Window.partitionBy("fp")
      .orderBy(col("b").desc, col("doc_id").desc)
    val win = odds.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1).select("doc_id", "source", "fp")
    val expected = win.unionByName(
        lake.join(win.select("fp"), Seq("fp"), "left_anti")
          .select("doc_id", "source", "fp"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("doc_id") % 2 === 1, 1L).otherwise(0L))
          .as("n_from_stream"))
      .orderBy("source").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      === expected.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)

    val again = Wave10Queries.qStreamMerge(spark, d).collect()
    assert(got.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq,
      "mtime-pinned file replay must be deterministic")
  }

  // ---- time travel ----

  test("time travel: v1 is the untouched lake, v2 carries every distinct " +
      "batch fingerprint, snapshots differ") {
    val rows = Wave10Queries.qTimeTravel(spark, d).collect()
    assert(rows.length === 2)
    val v1 = rows(0); val v2 = rows(1)
    val fp = TextStats.fingerprint(coalesce(col("text"), lit("")))
    val nEven = docs.filter(col("doc_id") % 2 === 0).count()
    val nOddFp = docs.filter(col("doc_id") % 2 === 1)
      .select(fp).distinct().count()
    assert(v1.getLong(1) === nEven, "v1 rows = lake rows")
    assert(v1.getLong(2) === 0L, "no batch rows leak into v1")
    assert(v2.getLong(2) === nOddFp, "v2 keeps one row per batch fp")
    assert(v1.getLong(3) !== v2.getLong(3), "snapshot fingerprints differ")
  }

  // ---- weighted sampling ----

  test("weighted sample: layout-independent and consistent with a " +
      "driver-side replay of the md5 threshold") {
    val out = Wave10Queries.qWeightedSample(spark, d).collect()
    // driver-side replay: same uniform, same rounded quality
    val per = docs.select(col("source"), col("doc_id"),
        round(TextStats.qualityScore(col("text")), 6).as("q"),
        (shiftrightunsigned(graft.text.Dedup.md5Hash64(
          col("doc_id").cast("string")), 4).cast("double")
          / lit(1152921504606846976L).cast("double")).as("u"))
      .collect()
    val expected = per.groupBy(_.getString(0)).map { case (src, rs) =>
      src -> rs.count(r => !r.isNullAt(2) && r.getDouble(3) < r.getDouble(2))
    }
    out.foreach { r =>
      assert(r.getLong(2) === expected(r.getString(0)).toLong,
        s"sampled count for ${r.getString(0)}")
    }
    // layout independence: a different partitioning must not move u or q
    val shuffled = Wave10Queries.qWeightedSample(spark, d).collect()
    assert(out.map(_.toSeq).toSeq === shuffled.map(_.toSeq).toSeq)
  }

  // ---- robust statistics ----

  test("robust stats: match a driver-side brute force per source") {
    val rows = Wave10Queries.qRobustStats(spark, d).collect()
    val data = docs.select(col("source"), col("doc_id"),
        col("n_chars").cast("long")).collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val src = r.getString(0)
      val xs = data(src).sortBy(x => (x.getLong(2), x.getLong(1)))
        .map(_.getLong(2))
      val n = xs.length
      def midAvg(v: Seq[Double]): Double =
        if (n % 2 == 1) v(n / 2) else (v(n / 2 - 1) + v(n / 2)) / 2.0
      val med = midAvg(xs.map(_.toDouble).toSeq)
      val devs = xs.map(x => math.abs(x - med)).sorted
      val mad = midAvg(devs.map(d => d).toSeq)
      val k = n / 10
      val trimmed = xs.slice(k, n - k)
      val lo = xs(k); val hi = xs(n - k - 1)
      val winsor = xs.map(x => math.min(math.max(x, lo), hi))
      assert(r.getLong(1) === n.toLong)
      assert(math.abs(r.getDouble(2) - med) < 1e-9, s"$src median")
      assert(math.abs(r.getDouble(3) - mad) < 1e-9, s"$src mad")
      assert(math.abs(r.getDouble(5)
        - trimmed.sum.toDouble / trimmed.length) < 1e-6, s"$src trimmed")
      assert(math.abs(r.getDouble(6)
        - winsor.sum.toDouble / n) < 1e-6, s"$src winsor")
      assert(r.getLong(7) === lo && r.getLong(8) === hi, s"$src caps")
    }
  }

  // ---- readability ----

  test("readability: bands follow the rounded score, empty docs land in " +
      "'empty'") {
    val rows = Wave10Queries.qReadability(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val band = r.getString(5)
      if (r.isNullAt(4)) assert(band === "empty")
      else {
        val f = r.getDouble(4)
        val want = if (f >= 90) "very_easy" else if (f >= 60) "standard"
          else if (f >= 30) "difficult" else "very_difficult"
        assert(band === want, s"doc ${r.getLong(0)}: $f -> $band")
        assert(r.getLong(1) > 0)
      }
    }
  }

  // ---- inverted index ----

  test("inverted index: df<=cf, rank ordering, and a brute-force check " +
      "of the top term's posting counts") {
    val rows = Wave10Queries.qInvertedIndex(spark, d).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(3),
      s"${r.getString(1)}: df>cf"))
    val dfs = rows.map(_.getLong(2)).toSeq
    assert(dfs === dfs.sortBy(-_), "ranked by df desc")
    val top = rows.head.getString(1)
    val brute = docs.select(col("doc_id"),
        TextStats.tokens(coalesce(col("text"), lit(""))).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    val cf = brute.map(_._2.count(_ == top)).sum
    val df = brute.count(_._2.contains(top))
    assert(rows.head.getLong(2) === df.toLong)
    assert(rows.head.getLong(3) === cf.toLong)
  }

  // ---- length buckets ----

  test("length buckets: partition the corpus, bucket bounds hold, waste " +
      "in [0,1)") {
    val rows = Wave10Queries.qLengthBuckets(spark, d).collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total === docs.count(), "every doc lands in exactly one bucket")
    rows.foreach { r =>
      val bucket = r.getLong(0); val nDocs = r.getLong(1)
      val nTok = r.getLong(2); val padded = r.getLong(3)
      assert(padded === nDocs * bucket)
      assert(nTok <= padded || bucket === 8192L,
        s"bucket $bucket overflows only at the top rung")
      val waste = r.getDouble(4)
      assert(waste < 1.0, s"bucket $bucket waste $waste")
    }
  }
}
