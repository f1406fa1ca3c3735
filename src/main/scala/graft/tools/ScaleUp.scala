package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builder tooling (not engine code): scale the synthetic test tables
  * up by an integer factor with REFERENTIALLY CONSISTENT key shifts —
  * replica `i` of every table shifts each key family by
  * `i × (max key + 1)` of the OWNING table, so joins match exactly
  * within a replica and never across replicas. Row counts, join
  * cardinalities and aggregate magnitudes scale linearly; fixed
  * dimensions (region, nation) stay fixed; timestamps keep their
  * range (time-density grows with the factor, as a bigger cluster's
  * ingest would). Text/embedding payloads replicate verbatim — a
  * corpus with a high exact-duplicate rate is a realistic (worst
  * case) dedup stress, and the oracle runs the same SQL on the same
  * files either way.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> <factor>
  * Emits one single-file `<t>.parquet` per table (what DuckDB's
  * oracle loader and `Tables.load` both expect). */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(src, dst, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def load(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def keyMax(t: String, c: String): Long =
      load(t).agg(max(col(c))).head().getLong(0) + 1L

    val kc = keyMax("customer", "c_custkey")
    val ks = keyMax("supplier", "s_suppkey")
    val kp = keyMax("part", "p_partkey")
    val ko = keyMax("orders", "o_orderkey")
    val ke = keyMax("events", "event_id")
    val ku = keyMax("events", "user_id")
    val kd = keyMax("documents", "doc_id")
    val kv = keyMax("embeddings", "vec_id")

    val shifts: Map[String, Seq[(String, Long)]] = Map(
      "region" -> Seq.empty,
      "nation" -> Seq.empty,
      "customer" -> Seq("c_custkey" -> kc),
      "supplier" -> Seq("s_suppkey" -> ks),
      "part" -> Seq("p_partkey" -> kp),
      "orders" -> Seq("o_orderkey" -> ko, "o_custkey" -> kc),
      "lineitem" -> Seq("l_orderkey" -> ko, "l_partkey" -> kp,
        "l_suppkey" -> ks),
      "events" -> Seq("event_id" -> ke, "user_id" -> ku),
      "documents" -> Seq("doc_id" -> kd),
      "embeddings" -> Seq("vec_id" -> kv))

    val fs = new org.apache.hadoop.fs.Path(dst)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dst))
    shifts.foreach { case (t, ss) =>
      val base = load(t)
      val out: DataFrame =
        if (ss.isEmpty) base // fixed dimension
        else (0 until factor).map { i =>
          ss.foldLeft(base) { case (df, (c, k)) =>
            df.withColumn(c, col(c) + lit(i.toLong * k))
          }
        }.reduce(_ unionByName _)
      val tmp = s"$dst/_tmp_$t"
      out.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      fs.rename(part, new org.apache.hadoop.fs.Path(s"$dst/$t.parquet"))
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      println(s"SCALEUP $t -> $dst/$t.parquet")
    }
    spark.stop()
  }
}
