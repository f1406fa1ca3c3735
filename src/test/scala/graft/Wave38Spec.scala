package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.Versioned

/** Wave-38: predicate DELETE with file-level pruning on the versioned
  * lake (the right-to-be-forgotten primitive). */
class Wave38Spec extends SparkSuite {

  private val d = sf("sf0.001")

  test("q_gdpr_delete: pruned rewrite, clean snapshot, intact history") {
    val r = SparkEntry.queries("q_gdpr_delete")(spark, d).head()
    assert(r.getAs[String]("one_file_rewritten") == "ok",
      "range clustering must confine one customer to one file")
    assert(r.getAs[String]("carried_rest") == "ok",
      "15 of 16 files must carry")
    assert(r.getAs[String]("v1_intact") == "ok",
      "time travel lost the history")
    assert(r.getAs[String]("cur_clean") == "ok",
      "erased rows survive in current")
    assert(r.getAs[Long]("deleted_rows") > 0L)
    assert(r.getAs[Int]("version") == 2)
  }

  test("delete: no-op predicate commits nothing and carries every file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_noop").toString
    try {
      val base = Tables.load(spark, d, "orders")
        .select(col("o_orderkey").as("k"), col("o_custkey").as("c"))
      Versioned.init(base.repartition(4), dir)
      val e = Versioned.delete(spark, dir, col("c") === -42L)
      assert(e.version == -1L && e.rewritten == 0 && e.deletedRows == 0L)
      assert(e.carried == Versioned.files(spark, dir).length)
      assert(Versioned.currentVersion(spark, dir).contains(1L),
        "a matched-nothing DELETE must not commit a new version")
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("delete: rewrite is row-exact — survivors only, erased only") {
    val dir = java.nio.file.Files.createTempDirectory("graft_exact").toString
    try {
      val base = Tables.load(spark, d, "orders")
        .select(col("o_orderkey").as("k"), col("o_custkey").as("c"))
      Versioned.init(base.repartition(8), dir)
      val total = base.count()
      val matching = base.filter(col("c") % 10 === 3).count()
      val e = Versioned.delete(spark, dir, col("c") % 10 === 3)
      assert(e.deletedRows == matching)
      val cur = Versioned.read(spark, dir)
      assert(cur.count() == total - matching)
      assert(cur.filter(col("c") % 10 === 3).count() == 0L)
      // hash clustering on k spreads every customer across all files,
      // so a 10%-of-customers predicate should hit every file — the
      // pruning win needs key clustering, which q_gdpr_delete pins;
      // here pin the complementary fact: correctness without it
      assert(e.rewritten + e.carried == 8)
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("delete: NULL-evaluating predicate rows are RETAINED, not dropped") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_null3vl").toString
    try {
      // v is NULL for k=2 → `v > 10` evaluates NULL there; SQL DELETE
      // must keep that row (delete only where pred IS TRUE)
      val base = Seq((1L, Some(5L)), (2L, None), (3L, Some(20L)))
        .toDF("k", "v")
      Versioned.init(base.coalesce(1), dir)
      val e = Versioned.delete(spark, dir, col("v") > 10)
      assert(e.deletedRows == 1L)
      val kept = Versioned.read(spark, dir).select("k").as[Long]
        .collect().toSet
      assert(kept == Set(1L, 2L),
        s"NULL-predicate row k=2 must survive the delete: $kept")
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("delete everything on a partitioned table leaves a readable " +
      "empty table that a later merge repopulates") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_delall").toString
    try {
      val base = Seq((1L, "one", "a"), (2L, "two", "b")).toDF("k", "v", "p")
      Versioned.init(base, dir, partitionCol = Some("p"))
      val e = Versioned.delete(spark, dir, lit(true),
        partitionCol = Some("p"))
      assert(e.deletedRows == 2L && e.carried == 0)
      val empty = Versioned.read(spark, dir)
      assert(empty.count() == 0L, "delete-everything must leave zero rows")
      assert(empty.columns.toSet == Set("k", "v", "p"),
        "the empty table must keep its schema")
      // the schema-only file must be rewritten (not carried beside
      // partitioned files) when data comes back
      Versioned.merge(Seq((3L, "three", "a")).toDF("k", "v", "p"),
        dir, Seq("k"), partitionCol = Some("p"))
      val back = Versioned.read(spark, dir)
      assert(back.select("k").as[Long].collect().toSeq == Seq(3L))
      assert(Versioned.files(spark, dir).forall(_.contains("/p=")),
        "repopulated manifest must be purely partition-layout files")
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }
}
