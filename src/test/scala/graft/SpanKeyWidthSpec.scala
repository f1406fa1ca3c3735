package graft

import org.apache.spark.sql.functions._

import graft.text.Dedup

/** 128-bit span-dedup keys ([[Dedup.spanCoverage]]): the collision trap.
  *
  * A true 64-bit md5 collision is out of brute-force reach (~2^32 work),
  * so the trap is staged at a width where the birthday bound IS
  * reachable: two DISTINCT tokens engineered to collide on a 16-bit fold
  * of the md5-64 key. The old narrow-key decision rule (grouped gram
  * count > 1) marks that pair duplicated — the overcount the r7 verdict
  * flagged — while the production 128-bit (h1, h2) path separates them.
  * The same scaling law is what bites 64-bit keys at 100 TB gram
  * cardinality; the mechanism under test is identical.
  *
  * Also pins the byte assembly of BOTH md5 halves against
  * java.security.MessageDigest little-endian bytes, which is what makes
  * DuckDB's md5_number_upper/md5_number_lower the exact oracle twins. */
class SpanKeyWidthSpec extends SparkSuite {

  import spark.implicits._

  private def jvmMd5(s: String): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))

  private def le64(b: Array[Byte], off: Int): Long =
    (0 until 8).map(i => (b(off + i).toLong & 0xFF) << (8 * i))
      .reduce(_ | _)

  /** First pair of distinct tokens whose md5-64 keys agree on the low
    * 16 bits — found deterministically by scanning t0, t1, …; the
    * birthday bound puts it within a few hundred candidates. */
  private lazy val (tokA, tokB) = {
    val seen = scala.collection.mutable.Map[Long, String]()
    Iterator.from(0).map(i => s"t$i").map { t =>
      val fold = le64(jvmMd5(t), 0) & 0xFFFFL
      val prev = seen.put(fold, t)
      (prev, t)
    }.collectFirst { case (Some(a), b) => (a, b) }.get
  }

  test("spark md5 halves equal JVM little-endian bytes (oracle twin proof)") {
    val r = Seq(tokA, tokB, "abc", "").toDF("t")
      .select(col("t"), Dedup.md5Hash64(col("t")).as("h1"),
        Dedup.md5Hash64Lo(col("t")).as("h2"))
      .collect()
    r.foreach { row =>
      val b = jvmMd5(row.getString(0))
      assert(row.getLong(1) === le64(b, 0), s"upper half of '${row.getString(0)}'")
      assert(row.getLong(2) === le64(b, 8), s"lower half of '${row.getString(0)}'")
    }
  }

  test("engineered 16-bit collision: narrow key overcounts, 128-bit separates") {
    assert(tokA !== tokB)
    val docs = Seq((1L, tokA), (2L, tokB)).toDF("doc_id", "text")

    // the narrow-key decision rule (what a folded key would compute):
    // both distinct grams land on one key -> marked duplicated
    val narrowDups = docs
      .select(Dedup.md5Hash64(col("text")).bitwiseAND(lit(0xFFFFL)).as("hf"))
      .groupBy("hf").count().filter(col("count") > 1).count()
    assert(narrowDups === 1L,
      "the engineered pair must collide under the 16-bit fold")

    // production path: full 128-bit key separates them -> zero coverage
    val wide = Dedup.spanCoverage(docs, k = 1).collect()
    assert(wide.length === 2)
    wide.foreach { r =>
      assert(r.getLong(2) === 0L, s"doc ${r.getLong(0)}: no dup grams")
      assert(r.getDouble(4) === 0.0, s"doc ${r.getLong(0)}: coverage 0")
    }
  }

  test("true duplicates still count at full width") {
    val docs = Seq((1L, s"$tokA $tokB end"), (2L, s"$tokA $tokB end"))
      .toDF("doc_id", "text")
    val r = Dedup.spanCoverage(docs, k = 1).collect()
    assert(r.length === 2)
    r.foreach { row =>
      assert(row.getDouble(4) === 1.0,
        s"doc ${row.getLong(0)}: identical docs are fully covered")
    }
  }
}
