package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ops.Versioned

/** The manifest-swap MERGE: upsert/insert/delete semantics, snapshot
  * isolation (an old version stays readable and bit-identical after a
  * commit), partition-scoped rewrite (untouched partitions carry over
  * by file REFERENCE, never rewritten), optimistic-concurrency
  * conflict handling, and vacuum's reference counting. */
class VersionedSpec extends SparkSuite {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_versioned").toString

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "v", "p").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

  private val base = Seq(
    (1L, "one", "a"), (2L, "two", "a"), (3L, "three", "b"), (4L, "four", "b"))

  test("merge = update + insert + delete, committed as a new version") {
    val dir = tmp()
    assert(Versioned.init(base.toDF("k", "v", "p"), dir) == 1L)
    val src = Seq(
      (2L, "TWO", "a", false),  // update
      (5L, "five", "b", false), // insert
      (3L, "", "b", true))      // delete
      .toDF("k", "v", "p", "is_delete")
    assert(Versioned.merge(src, dir, Seq("k"), deleteCol = Some("is_delete")) == 2L)
    assert(rows(Versioned.read(spark, dir)) == Set(
      (1L, "one", "a"), (2L, "TWO", "a"), (4L, "four", "b"), (5L, "five", "b")))
  }

  test("snapshot isolation: version 1 is bit-identical after the merge commits") {
    val dir = tmp()
    Versioned.init(base.toDF("k", "v", "p"), dir)
    val before = rows(Versioned.read(spark, dir, Some(1L)))
    Versioned.merge(Seq((1L, "ONE", "a", false)).toDF("k", "v", "p", "d"),
      dir, Seq("k"), deleteCol = Some("d"))
    assert(Versioned.currentVersion(spark, dir).contains(2L))
    assert(rows(Versioned.read(spark, dir, Some(1L))) == before,
      "a reader holding version 1 must keep its exact snapshot")
    assert(rows(Versioned.read(spark, dir))
      .contains((1L, "ONE", "a")))
  }

  test("partition-scoped merge carries untouched partitions by reference") {
    val dir = tmp()
    Versioned.init(base.toDF("k", "v", "p"), dir, partitionCol = Some("p"))
    val v1Files = Versioned.files(spark, dir, Some(1L)).toSet
    // source touches only partition a
    Versioned.merge(Seq((2L, "TWO", "a")).toDF("k", "v", "p"),
      dir, Seq("k"), partitionCol = Some("p"))
    val v2Files = Versioned.files(spark, dir, Some(2L)).toSet
    val v1b = v1Files.filter(_.contains("/p=b/"))
    assert(v1b.nonEmpty && v1b.subsetOf(v2Files),
      "partition b's files must appear in v2 UNREWRITTEN (same paths)")
    assert(v2Files.filter(_.contains("/p=a/")).forall(f => !v1Files.contains(f)),
      "partition a must be fully rewritten")
    assert(rows(Versioned.read(spark, dir)) == Set(
      (1L, "one", "a"), (2L, "TWO", "a"), (3L, "three", "b"), (4L, "four", "b")))
  }

  test("a lost commit race retries against the winner's snapshot") {
    val dir = tmp()
    Versioned.init(base.toDF("k", "v", "p"), dir)
    // simulate a concurrent winner: commit version 2 out from under us
    Versioned.merge(Seq((9L, "nine", "a")).toDF("k", "v", "p"), dir, Seq("k"))
    assert(Versioned.currentVersion(spark, dir).contains(2L))
    // this merge must land on version 3 and see the winner's row
    assert(Versioned.merge(Seq((2L, "TWO", "a")).toDF("k", "v", "p"),
      dir, Seq("k")) == 3L)
    val got = rows(Versioned.read(spark, dir))
    assert(got.contains((9L, "nine", "a")) && got.contains((2L, "TWO", "a")))
  }

  test("vacuum deletes only unreferenced files and keeps readable history") {
    val dir = tmp()
    Versioned.init(base.toDF("k", "v", "p"), dir)
    Versioned.merge(Seq((2L, "TWO", "a")).toDF("k", "v", "p"), dir, Seq("k"))
    Versioned.merge(Seq((2L, "TWO2", "a")).toDF("k", "v", "p"), dir, Seq("k"))
    val deleted = Versioned.vacuum(spark, dir, keepLast = 1)
    assert(deleted > 0, "superseded batch files must be reclaimed")
    assert(rows(Versioned.read(spark, dir)).contains((2L, "TWO2", "a")))
    intercept[Exception] { Versioned.read(spark, dir, Some(1L)).collect() }
  }
}
