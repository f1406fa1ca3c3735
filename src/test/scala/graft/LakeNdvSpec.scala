package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.Versioned

/** Manifest NDV sketches (wave 71): registered stats columns log a
  * per-file HLL + exact null count at commit; the DSv2 scan unions
  * them into planner column stats; with CBO on, a groupBy on the
  * low-NDV key estimates ~NDV rows and its join broadcasts at plan
  * time — the unsketched twin sort-merges. */
class LakeNdvSpec extends SparkSuite {

  private val d = sf("sf0.001")

  private def tmp(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_ndv_spec")

  private def rm(p: java.nio.file.Path): Unit = {
    val hp = new org.apache.hadoop.fs.Path(p.toString)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(hp, true)
  }

  private def data = Tables.load(spark, d, "orders").select(
    col("o_orderkey").as("k"), col("o_totalprice").as("p"),
    (col("o_orderkey") % 5).as("g"))

  test("commits log per-file HLL + null counts for stats columns; the " +
      "scan unions them into an exact-ish NDV with nullCount") {
    val work = tmp(); val t = work.resolve("a").toString
    try {
      Versioned.init(data.repartition(4), t, statsCols = Seq("g"))
      val entries = Versioned.manifestEntries(spark, t, 1L)
      assert(entries.nonEmpty && entries.forall(_._2.exists(sj =>
        sj.contains("\"#hll:g\"") && sj.contains("\"#nulls:g\""))),
        "every staged file must carry the g sketch and null count")
      // appended files keep logging sketches
      Versioned.append(data.limit(100).repartition(2), t)
      val rel = spark.read.format("graft-lake").option("path", t).load()
        .queryExecution.optimizedPlan.collectFirst {
          case r: org.apache.spark.sql.execution.datasources.v2
              .DataSourceV2ScanRelation => r
        }.get
      val cs = rel.stats.attributeStats.collectFirst {
        case (a, st) if a.name == "g" => st
      }
      assert(cs.exists(_.distinctCount.exists(n =>
          n >= BigInt(4) && n <= BigInt(6))),
        s"expected NDV ~5 for g, got $cs")
      assert(cs.exists(_.nullCount.contains(BigInt(0))))
    } finally rm(work)
  }

  test("CBO + manifest NDV flips the post-aggregation join to a " +
      "plan-time broadcast; the unsketched twin sort-merges") {
    val work = tmp()
    val a = work.resolve("a").toString; val b = work.resolve("b").toString
    val cbo = spark.conf.getOption("spark.sql.cbo.enabled")
    val thr = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      Versioned.init(data.repartition(4), a, statsCols = Seq("g"))
      Versioned.init(data.repartition(4), b)
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "8192")
      def shaped(dir: String) = {
        val t = spark.read.format("graft-lake").option("path", dir).load()
        t.join(t.groupBy("g").agg(count(lit(1)).as("n_g")), "g")
      }
      val withPlan = shaped(a).queryExecution.executedPlan.toString
      val noPlan = shaped(b).queryExecution.executedPlan.toString
      assert(withPlan.contains("BroadcastHashJoin"),
        s"NDV table must broadcast:\n${withPlan.take(500)}")
      assert(noPlan.contains("SortMergeJoin") &&
          !noPlan.contains("BroadcastHashJoin"),
        s"twin without NDV must sort-merge:\n${noPlan.take(500)}")
      // and the broadcast plan computes the right answer
      assert(shaped(a).count() == shaped(b).count())
    } finally {
      cbo.fold(spark.conf.unset("spark.sql.cbo.enabled"))(
        spark.conf.set("spark.sql.cbo.enabled", _))
      thr.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
      rm(work)
    }
  }
}
