package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.text.Similarity

/** Scratch measurement (r15): recall@5 of IVF and IVF+PQ under
  * corpus-size-scaled dials — the r14 verdict flagged the FIXED dials'
  * recall falling with corpus size (ivfpq 0.88 → 0.76, ivf 0.52–0.64).
  * Sweeps the √n rule (nLists ∝ √n) at several probe fractions and
  * shortlist scalings to pick the production defaults + floors. */
object AnnDialSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val e = Tables.load(spark, s"/root/testdata/$sf", "embeddings")
      val n = e.count()
      val q = e.filter(col("vec_id") < lit(10L))
      val truth = Similarity.bruteForceTopK(e, q, 5)
        .select("query_id", "neighbor_id").cache()
      val nTrue = truth.count()
      def rec(found: org.apache.spark.sql.DataFrame): Double = {
        val h = found.select("query_id", "neighbor_id")
          .join(truth, Seq("query_id", "neighbor_id")).count()
        if (nTrue == 0) 1.0 else h.toDouble / nTrue
      }
      val root = math.ceil(math.sqrt(n.toDouble)).toInt
      // IVF: fixed current dial vs √n-scaled at probe fractions
      for ((nl, np, tag) <- Seq(
          (16, 4, "r14-fixed"),
          (root, math.max(1, (root * 0.3).round.toInt), "sqrt-p30"),
          (root, math.max(1, (root * 0.5).round.toInt), "sqrt-p50"),
          (root / 2, math.max(1, (root * 0.3).round.toInt), "halfsqrt-p60"))) {
        val r = rec(Similarity.ivfTopK(e, q, 5, nLists = nl, nProbe = np))
        println(f"IVF   $sf n=$n nLists=$nl nProbe=$np [$tag] recall=$r%.3f")
      }
      // IVF+PQ: fixed dial vs √n lists + scaled shortlist
      for ((nl, np, sl, tag) <- Seq(
          (8, 5, 64, "r14-fixed"),
          (8, 5, math.max(64, 4 * root), "fixed+sl4rt"),
          (root, math.max(1, (root * 0.4).round.toInt), math.max(64, 4 * root), "sqrt-p40-sl4rt"),
          (root, math.max(1, (root * 0.6).round.toInt), math.max(64, 4 * root), "sqrt-p60-sl4rt"))) {
        val r = rec(Similarity.ivfPqTopK(e, q, 5, nLists = nl,
          nProbe = np, nSub = 16, nCodes = 32, shortlist = sl))
        println(f"IVFPQ $sf n=$n nLists=$nl nProbe=$np sl=$sl [$tag] recall=$r%.3f")
      }
      truth.unpersist()
    }
    spark.stop()
  }
}
