package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.Versioned

/** Round-12 wave 68 — manifest statistics drive Spark's JOIN PLANNING:
  *
  *  - `q_lake_cbo`: the lake connector reports filter-aware
  *    `Statistics` (row count from the manifest's per-file `#rows`
  *    stats × the pruned read schema's width) through DSv2
  *    `SupportsReportStatistics`. Without it, every DSv2 relation
  *    weighs in at `spark.sql.defaultSizeInBytes` (effectively
  *    infinite) and a 100-row lake dimension still SORT-MERGES
  *    against a fact table — the single most expensive silent
  *    planning failure a 100 TB join can make. The receipt pins the
  *    physical outcome: the fact ⋈ lake-dim join selects
  *    BroadcastHashJoin with the LAKE side as the build side, and
  *    the join's aggregate is replayed exactly by the oracle.
  *
  * 100 TB story: statistics are METADATA-ONLY (one manifest read —
  * no file opened, no per-file FileSystem call), version-pinned with
  * the scan, and follow file pruning: a probe that keeps 3 of a
  * million files reports 3 files' rows, so the planner sees the
  * footprint the scan will actually pay, not the table's.
  */
object Wave68Queries {

  def qLakeCbo(s: SparkSession, d: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft_cbo")
      .resolve("t").toString
    try {
      // statsCols registers per-file stats in the manifest — the
      // `#rows` entries are what the scan's Statistics read
      Versioned.init(Tables.load(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
        .repartition(4), dir, statsCols = Seq("c_custkey"))
      val dim = s.read.format("graft-lake").option("path", dir).load()
      val joined = Tables.load(s, d, "orders")
        .select(col("o_custkey"), col("o_totalprice"))
        .join(dim, col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      val bhj = plan.contains("BroadcastHashJoin")
      // the stats the planner actually saw for the lake relation:
      // reported (not the defaultSizeInBytes fallback) and under the
      // broadcast threshold — i.e. the manifest estimate, not luck,
      // made the join broadcast
      val lakeSize = joined.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.stats.sizeInBytes
      }.getOrElse(BigInt(-1))
      val threshold = s.sessionState.conf.autoBroadcastJoinThreshold
      val out = joined.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          Q.dsum(col("o_totalprice")).as("revenue"))
        .withColumn("stats_broadcast",
          lit(Q.receipt(bhj && lakeSize > 0 && lakeSize <= threshold,
            s"bhj=$bhj lakeSize=$lakeSize threshold=$threshold")))
        .orderBy("c_mktsegment")
      // materialize before the finally-cleanup deletes the lake
      import s.implicits._
      out.collect().toSeq
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getString(3)))
        .toDF("c_mktsegment", "n_orders", "revenue", "stats_broadcast")
    } finally {
      val p = new org.apache.hadoop.fs.Path(
        new java.io.File(dir).getParent)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_lake_cbo" -> qLakeCbo)

  val oracles: Map[String, String] = Map(
    "q_lake_cbo" ->
      s"""SELECT c_mktsegment, count(*) AS n_orders,
         |  ${Q.DSUM("o_totalprice")} AS revenue,
         |  'ok' AS stats_broadcast
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment""".stripMargin)
}
