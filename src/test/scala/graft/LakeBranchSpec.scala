package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.Versioned

/** Writable branches with OCC squash publish (wave 68):
  * branch = zero-copy clone + recorded base, publish = ONE reference
  * commit on the source that wins only if the source never moved. */
class LakeBranchSpec extends SparkSuite {

  private val d = sf("sf0.001")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("t").toString

  private def rm(dirs: String*): Unit = dirs.foreach { d0 =>
    val p = new org.apache.hadoop.fs.Path(
      new java.io.File(d0).getParent)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
  }

  private def base() = Tables.load(spark, d, "orders")
    .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))

  test("branch work is invisible to the source; publish folds the " +
      "head back as one metadata commit") {
    val (main, br) = (tmp("graft_bs1m"), tmp("graft_bs1b"))
    try {
      Versioned.init(base().repartition(4), main)
      val n0 = Versioned.read(spark, main).count()
      Versioned.branch(spark, main, br)
      Versioned.merge(Versioned.read(spark, br)
        .filter(col("k") % 2 === 0)
        .withColumn("p", col("p") + lit(1.0)), br, Seq("k"))
      Versioned.deleteVectored(spark, br, col("k") % 5 === 0)
      // source untouched
      assert(Versioned.currentVersion(spark, main).contains(1L))
      assert(Versioned.read(spark, main).count() == n0)
      val headFiles = Versioned.files(spark, br).toSet
      val headN = Versioned.read(spark, br).count()
      val v = Versioned.publish(spark, br)
      assert(v == 2L)
      // the published version references the branch head's files
      assert(Versioned.files(spark, main, Some(2L)).toSet == headFiles)
      assert(Versioned.read(spark, main).count() == headN)
      assert(Versioned.history(spark, main).last.operation ==
        "PUBLISH(2 commits)")
      // time travel still sees the pre-publish source
      assert(Versioned.read(spark, main, Some(1L)).count() == n0)
    } finally rm(main, br)
  }

  test("a stale branch (source moved since the cut) is refused with " +
      "zero effect") {
    val (main, b1, b2) = (tmp("graft_bs2m"), tmp("graft_bs2a"),
      tmp("graft_bs2b"))
    try {
      Versioned.init(base().repartition(4), main)
      Versioned.branch(spark, main, b1)
      Versioned.branch(spark, main, b2)
      Versioned.merge(Versioned.read(spark, b1)
        .withColumn("p", col("p") + lit(1.0)), b1, Seq("k"))
      Versioned.merge(Versioned.read(spark, b2)
        .withColumn("p", col("p") + lit(2.0)), b2, Seq("k"))
      assert(Versioned.publish(spark, b1) == 2L)
      val before = Versioned.read(spark, main)
        .agg(sum(col("p"))).head().getDouble(0)
      intercept[IllegalArgumentException] {
        Versioned.publish(spark, b2)
      }
      assert(Versioned.currentVersion(spark, main).contains(2L))
      assert(Versioned.read(spark, main)
        .agg(sum(col("p"))).head().getDouble(0) == before)
    } finally rm(main, b1, b2)
  }

  test("the branch workflow runs through pure SQL (CALL lake.branch " +
      "/ lake.publish)") {
    spark.conf.set("spark.sql.catalog.lake", "graft.sources.LakeCatalog")
    val (main, br) = (tmp("graft_bs4m"), tmp("graft_bs4b"))
    try {
      Versioned.init(base().repartition(2), main)
      val cut = spark.sql(
        s"CALL lake.branch('$main', '$br')").head()
      assert(cut.getLong(0) == 1L && cut.getLong(1) == 1L)
      Versioned.merge(Versioned.read(spark, br)
        .withColumn("p", col("p") + lit(3.0)), br, Seq("k"))
      val pub = spark.sql(s"CALL lake.publish('$br')").head()
      assert(pub.getLong(0) == 2L)
      assert(Versioned.history(spark, main).last.operation ==
        "PUBLISH(1 commits)")
    } finally rm(main, br)
  }

  test("racing publishes from sibling branches: exactly one wins, " +
      "the loser has zero effect") {
    val (main, b1, b2) = (tmp("graft_bs5m"), tmp("graft_bs5a"),
      tmp("graft_bs5b"))
    try {
      Versioned.init(base().repartition(4), main)
      Seq(b1, b2).foreach(Versioned.branch(spark, main, _))
      Versioned.merge(Versioned.read(spark, b1)
        .withColumn("p", col("p") + lit(1.0)), b1, Seq("k"))
      Versioned.merge(Versioned.read(spark, b2)
        .withColumn("p", col("p") + lit(2.0)), b2, Seq("k"))
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val gate = new java.util.concurrent.CountDownLatch(1)
      val attempts = Seq(b1, b2).map { br =>
        Future {
          gate.await()
          try Right(Versioned.publish(spark, br))
          catch { case e: IllegalArgumentException => Left(e) }
        }
      }
      gate.countDown()
      val results = attempts.map(Await.result(_, 5.minutes))
      assert(results.count(_.isRight) == 1,
        s"exactly one publish must win: $results")
      assert(Versioned.currentVersion(spark, main).contains(2L))
      // the surviving content is exactly ONE sibling's work
      val sums = Seq(b1, b2).map(br => Versioned.read(spark, br)
        .agg(sum(col("p"))).head().getDouble(0))
      val got = Versioned.read(spark, main)
        .agg(sum(col("p"))).head().getDouble(0)
      assert(sums.contains(got), s"main sum $got not one of $sums")
    } finally rm(main, b1, b2)
  }

  test("a branch with no commits refuses publish; a non-branch " +
      "refuses publish") {
    val (main, br) = (tmp("graft_bs3m"), tmp("graft_bs3b"))
    try {
      Versioned.init(base().repartition(2), main)
      Versioned.branch(spark, main, br)
      intercept[IllegalArgumentException] {
        Versioned.publish(spark, br)
      }
      intercept[RuntimeException] {
        Versioned.publish(spark, main)
      }
    } finally rm(main, br)
  }
}
