package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Q

/** Distributed linear algebra over the embedding table — the two
  * fixpoint workhorses a 100 TB embedding pipeline needs beyond search:
  * top-principal-component extraction (whitening / drift monitoring /
  * SemDeDup preprocessing) and full-corpus Lloyd k-means (semantic
  * sharding, cluster-balanced splits — the DISTRIBUTED path, where the
  * IVF/PQ quantizers deliberately fit on a capped driver sample).
  *
  * Both follow the same scale shape per iteration: ONE scan of the
  * vectors, a map-side-combining aggregate whose group count is tiny
  * (dim, or k·dim — so the shuffle is partitions × groups rows, not
  * data-sized), and a dim-sized (or k·dim-sized) driver sync point that
  * becomes the next iteration's broadcast literal. That sync is the
  * classic power-iteration / Lloyd structure (MLlib's KMeans does the
  * same collect per round); nothing data-sized ever reaches the driver.
  *
  * Cross-engine exactness: every per-row float op is IEEE-identical in
  * both engines (left-to-right index-order folds, matching DuckDB's
  * `list_sum(list_transform(range(...)))`), and every cross-row SUM
  * goes through [[Q.gsum]]'s integer-grid quantizer — so iterations
  * produce bit-identical vectors regardless of partitioning, AQE
  * replans, or aggregation order, and the DuckDB oracle can replay the
  * whole iteration chain to the last ulp.
  */
object Linalg {

  /** Squared-L2 distance to a literal centroid in the decomposed form
    * `‖x‖² − 2·x·c + ‖c‖²` so both dot products run through the
    * codegen'd [[graft.functions.VectorExpressions.vector_dot]] (the
    * naive per-element `(x−c)²` fold costs k interpreted higher-order
    * lambdas per row — measured 18 s vs ~2 s at sf0.1). ‖x‖² is
    * computed once per row and shared across all k centroids; ‖c‖² is
    * an index-order driver-side fold baked in as a literal. The DuckDB
    * twin spells the identical three-term arithmetic, so the
    * cancellation behavior (including a possible −1e−16 for x ≈ c) is
    * bit-identical in both engines. */
  private def dist2(emb: Column, xx: Column, c: Array[Double]): Column = {
    val cc = c.foldLeft(0.0)((a, v) => a + v * v)
    xx - lit(2.0) * graft.functions.VectorExpressions.vector_dot(emb, lit(c)) + lit(cc)
  }

  private def XX(e: String, dim: Int): String =
    s"list_sum(list_transform(range($dim), k -> " +
      s"CAST($e[k+1] AS DOUBLE) * CAST($e[k+1] AS DOUBLE)))"

  private def DIST2(xx: String, e: String, cv: String, dim: Int): String =
    s"($xx - 2.0 * list_sum(list_transform(range($dim), k -> " +
      s"CAST($e[k+1] AS DOUBLE) * $cv[k+1])) " +
      s"+ list_sum(list_transform($cv, x -> x*x)))"

  // ---------------------------------------------------------------- PCA

  /** Top principal component of the (mean-centered) embedding matrix by
    * `iters` rounds of power iteration; v0 = 1/√dim in every component.
    *
    * Output: one row per component — (component, loading, eigenvalue,
    * explained_var_ratio), where eigenvalue = ‖Σᵢ cᵢ(cᵢ·v)‖ / (n−1) at
    * the final round (the sample-covariance top eigenvalue once v has
    * converged) and the ratio divides by total variance Σᵢⱼcᵢⱼ²/(n−1).
    *
    * Per iteration: one scan computes dᵢ = cᵢ·v (codegen'd VectorDot on
    * the broadcast-literal v), pos-explodes the centered vector, and
    * grid-sums wⱼ = Σᵢ cᵢⱼ·dᵢ into `dim` groups; the dim-sized w comes
    * to the driver for the normalize step. The returned frame re-derives
    * the final w in-plan (the collect only feeds the scalar ‖w‖ and the
    * next-round literals), so the result is plan-produced end to end. */
  def powerIteration(embs: DataFrame, dim: Int, iters: Int): DataFrame = {
    val emb = col("embedding")
    val n = embs.count()

    // mean vector (grid-exact sums / n), then the centered array used
    // by every subsequent pass
    val muRows = embs.select(posexplode(emb).as(Seq("j", "x")))
      .groupBy("j").agg(Q.gsum(col("x").cast("double")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val mu = Array.tabulate(dim)(j => muRows(j) / n)
    val cent = zip_with(emb, lit(mu), (x, m) => x.cast("double") - m)

    def wFrame(v: Array[Double]): DataFrame = {
      val d = graft.functions.VectorExpressions.vector_dot(cent, lit(v))
      embs.select(d.as("d"), posexplode(cent).as(Seq("j", "cv")))
        .groupBy("j").agg(Q.gsum(col("cv") * col("d")).as("w"))
    }
    def collectW(f: DataFrame): Array[Double] = {
      val m = f.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      Array.tabulate(dim)(m)
    }
    def normOf(w: Array[Double]): Double =
      math.sqrt(w.foldLeft(0.0)((a, x) => a + x * x))

    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 1 until iters) {
      val w = collectW(wFrame(v))
      val nrm = normOf(w)
      v = w.map(_ / nrm)
    }
    val last = wFrame(v)
    val nrm = normOf(collectW(last))
    val tv = embs.select(posexplode(cent).as(Seq("j", "cv")))
      .agg(Q.gsum(col("cv") * col("cv"))).first().getDouble(0)
    val eig = nrm / (n - 1.0)
    val evr = eig / (tv / (n - 1.0))
    last.select(col("j").cast("int").as("component"),
        round(col("w") / lit(nrm), 6).as("loading"))
      .withColumn("eigenvalue", round(lit(eig), 6))
      .withColumn("explained_var_ratio", round(lit(evr), 6))
      .orderBy("component")
  }

  /** DuckDB twin of [[powerIteration]] — replays the mean, every
    * iteration's dot/grid-sum/normalize, and the final loadings. */
  def POWER_SQL(dim: Int, iters: Int): String = {
    val its = (1 to iters).map { t =>
      val pv = if (t == 1) "v0" else s"v${t - 1}"
      s"""d$t AS (SELECT vec_id,
         |  list_sum(list_transform(range($dim), k -> cv[k+1] * v[k+1])) AS d
         |  FROM cent, $pv),
         |w$t AS (SELECT i.i AS j, ${Q.GSUM("c.cv[i.i+1] * d.d")} AS w
         |  FROM cent c JOIN d$t d USING (vec_id), range($dim) i(i)
         |  GROUP BY i.i),
         |n$t AS (SELECT sqrt(list_sum(list_transform(
         |    list(w ORDER BY j), x -> x*x))) AS nrm FROM w$t),
         |v$t AS (SELECT list(w / nrm ORDER BY j) AS v FROM w$t, n$t)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH mu0 AS (SELECT i.i AS j,
       |    ${Q.GSUM("CAST(e.embedding[i.i+1] AS DOUBLE)")} AS s,
       |    count(*) AS c
       |  FROM embeddings e, range($dim) i(i) GROUP BY i.i),
       |mu AS (SELECT list(s / c ORDER BY j) AS m FROM mu0),
       |cnt AS (SELECT count(*) AS n FROM embeddings),
       |cent AS (SELECT vec_id, list_transform(range($dim),
       |    k -> CAST(embedding[k+1] AS DOUBLE) - m[k+1]) AS cv
       |  FROM embeddings, mu),
       |v0 AS (SELECT list_transform(range($dim),
       |    k -> 1.0 / sqrt(CAST($dim AS DOUBLE))) AS v),
       |$its,
       |tv AS (SELECT ${Q.GSUM("c.cv[i.i+1] * c.cv[i.i+1]")} AS tv
       |  FROM cent c, range($dim) i(i))
       |SELECT CAST(w.j AS INTEGER) AS component,
       |  round(w.w / n.nrm, 6) AS loading,
       |  round(n.nrm / (cnt.n - 1.0), 6) AS eigenvalue,
       |  round((n.nrm / (cnt.n - 1.0)) / (tv.tv / (cnt.n - 1.0)), 6)
       |    AS explained_var_ratio
       |FROM w$iters w, n$iters n, cnt, tv
       |ORDER BY component""".stripMargin
  }

  // ------------------------------------------------------------ k-means

  /** Full-corpus Lloyd k-means: `iters` assignment+update rounds, then
    * one final assignment pass that PRODUCES the output — per (cluster,
    * component): the member-mean centroid, plus per-cluster size, exact
    * grid-summed inertia, and the majority `label` (tie → smallest).
    *
    * Init = the k vectors with vec_id < k (deterministic, no RNG).
    * Assignment is ROW-LOCAL: the k centroids ride along as broadcast
    * literals, dist² is a codegen-friendly index-order fold, argmin =
    * first index reaching the array minimum (ties → lowest cluster id,
    * mirrored by the oracle's `ORDER BY d2, c` rank). Update = one
    * pos-explode + grid-sum into k·dim groups (map-side combined), a
    * k·dim driver sync. A cluster that loses all members carries its
    * previous centroid (oracle: LEFT JOIN + coalesce on the full grid);
    * a cluster empty under the FINAL assignment simply has no output
    * rows — both engines agree on membership, so they agree on that. */
  def kmeans(embs: DataFrame, dim: Int, k: Int, iters: Int): DataFrame = {
    val emb = col("embedding")
    // one dists array per row, both derivations read it once
    def withAssignment(cents: Array[Array[Double]]): DataFrame = {
      val xx = graft.functions.VectorExpressions.vector_dot(emb, emb)
      val dists = array(cents.map(dist2(emb, xx, _)).toIndexedSeq: _*)
      embs.withColumn("dists", dists)
        .withColumn("cluster",
          (array_position(col("dists"), array_min(col("dists"))) - 1).cast("int"))
        .withColumn("d2", array_min(col("dists")))
    }

    var cents = embs.filter(col("vec_id") < k)
      .select(col("vec_id"), emb).collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)

    for (_ <- 1 to iters) {
      val m = withAssignment(cents)
        .select(col("cluster"), posexplode(emb).as(Seq("j", "x")))
        .groupBy("cluster", "j")
        .agg((Q.gsum(col("x").cast("double")) / count(lit(1))).as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
      cents = Array.tabulate(k)(c =>
        Array.tabulate(dim)(j => m.getOrElse((c, j), cents(c)(j))))
    }

    // the final assignment feeds three derivations (stats, labels,
    // member means) — cache it so the distance pass runs once
    val a = withAssignment(cents)
      .select(col("vec_id"), col("cluster"), col("d2"), col("label"), emb)
      .persist()
    val stats = a.groupBy("cluster").agg(
      count(lit(1)).as("n_members"),
      round(Q.gsum(col("d2")), 6).as("inertia"))
    val wTop = Window.partitionBy("cluster")
      .orderBy(col("cnt").desc, col("label").asc)
    val top = a.groupBy("cluster", "label").agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(wTop)).filter(col("rk") === 1)
      .select(col("cluster"), col("label").as("top_label"))
    val cmeans = a.select(col("cluster"), posexplode(emb).as(Seq("j", "x")))
      .groupBy("cluster", "j")
      .agg((Q.gsum(col("x").cast("double")) / count(lit(1))).as("c"))
    cmeans.join(stats, "cluster").join(top, "cluster")
      .select(col("cluster"), col("j").cast("int").as("component"),
        round(col("c"), 6).as("centroid"),
        col("n_members"), col("inertia"), col("top_label"))
      .orderBy("cluster", "component")
  }

  /** DuckDB twin of [[kmeans]] — replays init, every round's ranked
    * assignment + carried update, and the final output pass. */
  def KMEANS_SQL(dim: Int, k: Int, iters: Int): String = {
    def assign(name: String, cents: String): String =
      s"""$name AS (SELECT vec_id, c, d2 FROM (
         |  SELECT x.vec_id, x.c, x.d2,
         |    row_number() OVER (PARTITION BY x.vec_id
         |                       ORDER BY x.d2 ASC, x.c ASC) AS rk
         |  FROM (SELECT e.vec_id, cc.c,
         |          ${DIST2("e.xx", "e.embedding", "cc.cv", dim)} AS d2
         |        FROM ex e, $cents cc) x)
         |  WHERE rk = 1)""".stripMargin
    val its = (1 to iters).map { t =>
      val prevGrid = s"grid${t - 1}"
      s"""cents${t - 1} AS (SELECT c, list(val ORDER BY j) AS cv
         |  FROM $prevGrid GROUP BY c),
         |${assign(s"a$t", s"cents${t - 1}")},
         |m$t AS (SELECT a.c, i.i AS j,
         |    ${Q.GSUM("CAST(e.embedding[i.i+1] AS DOUBLE)")} AS s,
         |    count(*) AS n
         |  FROM a$t a JOIN embeddings e USING (vec_id), range($dim) i(i)
         |  GROUP BY a.c, i.i),
         |grid$t AS (SELECT g.c, g.j, coalesce(m.s / m.n, g.val) AS val
         |  FROM $prevGrid g LEFT JOIN m$t m ON m.c = g.c AND m.j = g.j)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH ex AS (SELECT vec_id, embedding,
       |    ${XX("embedding", dim)} AS xx FROM embeddings),
       |grid0 AS (SELECT vec_id AS c, i.i AS j,
       |    CAST(embedding[i.i+1] AS DOUBLE) AS val
       |  FROM embeddings, range($dim) i(i) WHERE vec_id < $k),
       |$its,
       |centsF AS (SELECT c, list(val ORDER BY j) AS cv
       |  FROM grid$iters GROUP BY c),
       |${assign("af", "centsF")},
       |stats AS (SELECT c, CAST(count(*) AS BIGINT) AS n_members,
       |    round(${Q.GSUM("d2")}, 6) AS inertia
       |  FROM af GROUP BY c),
       |lab AS (SELECT a.c, e.label, count(*) AS cnt
       |  FROM af a JOIN embeddings e USING (vec_id) GROUP BY a.c, e.label),
       |top AS (SELECT c, label AS top_label FROM (
       |    SELECT c, label, row_number() OVER (PARTITION BY c
       |      ORDER BY cnt DESC, label ASC) AS rk FROM lab)
       |  WHERE rk = 1),
       |cm AS (SELECT a.c, i.i AS j,
       |    ${Q.GSUM("CAST(e.embedding[i.i+1] AS DOUBLE)")} / count(*) AS cval
       |  FROM af a JOIN embeddings e USING (vec_id), range($dim) i(i)
       |  GROUP BY a.c, i.i)
       |SELECT CAST(cm.c AS INTEGER) AS cluster,
       |  CAST(cm.j AS INTEGER) AS component,
       |  round(cm.cval, 6) AS centroid,
       |  stats.n_members, stats.inertia, top.top_label
       |FROM cm JOIN stats USING (c) JOIN top USING (c)
       |ORDER BY cluster, component""".stripMargin
  }
}
