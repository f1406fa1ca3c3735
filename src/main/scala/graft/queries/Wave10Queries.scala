package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.io.Tables
import graft.ops.Versioned
import graft.streaming.Events
import graft.text.{Dedup, TextStats}

/** Round-7 wave 10 — lake/stream convergence and the sampling/statistics
  * operators a curation team reaches for between the funnel and the
  * export:
  *
  *  - `q_stream_merge`: the STREAMING side of the versioned lake —
  *    micro-batches foreachBatch-MERGEd into a [[Versioned]] table with
  *    replay-idempotent version bookkeeping (exactly-once upsert, the
  *    production CDC-ingest shape).
  *  - `q_time_travel`: snapshot isolation made observable — version 1
  *    read AFTER version 2 commits, both snapshots fingerprinted.
  *  - `q_weighted_sample`: deterministic quality-weighted Bernoulli
  *    sampling (P(keep) = quality score, seeded by a cross-engine md5
  *    uniform) — the "sample better data more" knob of a mixture
  *    pipeline, reproducible run-to-run and engine-to-engine.
  *  - `q_robust_stats`: exact median / MAD / trimmed / winsorized mean
  *    per source — the outlier-resistant profile a curation dashboard
  *    wants next to plain averages.
  *  - `q_readability`: Flesch-style reading-ease from vowel-group
  *    syllable counts — a classic cheap quality signal.
  *  - `q_inverted_index`: positional posting-list construction with an
  *    order-independent postings fingerprint — the retrieval-infra twin
  *    of the BM25 scorer.
  *  - `q_length_buckets`: padding-waste accounting for length-bucketed
  *    batching — what a serving/training batcher pays at each bucket
  *    ladder rung.
  */
object Wave10Queries {

  private def docs(s: SparkSession, d: String) = Tables.load(s, d, "documents")

  private val T = TextStats.TOKENS("text")
  private val TWO60 = 1152921504606846976L // 2^60, exact in double

  // ---- streaming MERGE into the versioned lake ----

  /** Deterministic doc → (doc_id, source, fp) projection both the lake
    * init and the stream batches share. */
  private def fpDocs(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("doc_id"), col("source"),
      TextStats.fingerprint(coalesce(col("text"), lit(""))).as("fp"))

  /** Stream→lake MERGE: the even-id half of `documents` is the lake
    * (version 1); the odd-id half arrives as a REAL file stream in three
    * micro-batches (split by `doc_id % 3`, file mtimes pinned so the
    * source replays them in batch order), and `foreachBatch` MERGEs each
    * batch into the [[Versioned]] table keyed on content fingerprint.
    *
    * Exactly-once: batch b commits version b+2, and the sink skips any
    * batch whose version already exists — a foreachBatch replay after a
    * failure (Spark's at-least-once contract) re-runs the merge only if
    * its commit is missing, which is the standard idempotent-sink
    * pattern (batchId ↔ version). Within a batch, duplicate keys keep
    * the highest doc_id (micro-batch dedup before merge); across
    * batches, the LAST batch wins (MERGE update semantics).
    *
    * Scale: each micro-batch pays one broadcast-able anti-join against
    * the partition-pruned target (see `Versioned.merge`) — state lives
    * in the lake manifest, not the stream, so the stream itself is
    * stateless and the pattern survives any corpus size. The oracle
    * replays init + 3 merges in pure SQL (within-batch dedup, last-
    * batch-wins, anti-join + union). */
  def qStreamMerge(s: SparkSession, d: String): DataFrame = {
    // staged odd-doc batches are immutable per sf dir — JVM-memoized
    // (Events.stagedInputs); checkpoint and the MUTATED lake clone
    // stay per-run (a reused checkpoint would skip every batch and
    // leave the fresh clone unmerged)
    val dir = Events.stagedInputs(s"smerge|$d") { dir0 =>
      val all = fpDocs(s, d)
      val hfs = new org.apache.hadoop.fs.Path(dir0)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      (0 to 2).foreach { b =>
        val stage = s"$dir0/stage/b$b"
        all.filter(col("doc_id") % 2 === 1 && col("doc_id") % 3 === b)
          .coalesce(1).write.mode("overwrite").parquet(stage)
        val part = hfs.listStatus(new org.apache.hadoop.fs.Path(stage))
          .map(_.getPath).find(_.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no staged part file for batch $b"))
        val in = new org.apache.hadoop.fs.Path(s"$dir0/in/b$b.parquet")
        hfs.mkdirs(in.getParent)
        hfs.rename(part, in)
        // the file source replays oldest-mtime first — pin batch order
        hfs.setTimes(in, 10000L * (b + 1), -1L)
      }
    }
    val ck = Events.scratchCheckpoint("smerge")
    val work = java.nio.file.Files.createTempDirectory("graft_smerge").toString
    val lakePath = s"$work/lake"
    try {
      Versioned.clone(s, LakeFixtures.docsEvensFp(s, d), lakePath)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("source", StringType),
        StructField("fp", StringType)))
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
      val q = stream.writeStream
        .foreachBatch { (bdf: DataFrame, batchId: Long) =>
          val committed = Versioned.currentVersion(s, lakePath).getOrElse(0L)
          if (committed < batchId + 2) { // replay-idempotent: batch b → v(b+2)
            val w = Window.partitionBy("fp").orderBy(col("doc_id").desc)
            val deduped = bdf.withColumn("rk", row_number().over(w))
              .filter(col("rk") === 1).drop("rk")
            Versioned.merge(deduped, lakePath, Seq("fp"))
            ()
          }
        }
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      // wait for AvailableNow self-termination (see Events.runToCompletion
      // — processAllAvailable alone races the final micro-batch)
      try {
        q.processAllAvailable()
        if (!q.awaitTermination(300000L))
          sys.error("stream-merge replay did not terminate within 300s")
      } finally q.stop()
      val nv = Versioned.currentVersion(s, lakePath).getOrElse(0L)
      import s.implicits._
      Versioned.read(s, lakePath)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("doc_id") % 2 === 1, 1L).otherwise(0L))
            .as("n_from_stream"))
        .orderBy("source")
        .collect().toSeq
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), nv))
        .toDF("source", "n_docs", "n_from_stream", "n_versions")
    } finally {
      Seq(ck, work).foreach { p0 =>
        val p = new org.apache.hadoop.fs.Path(p0)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }
  }

  // ---- time travel ----

  /** Snapshot isolation made observable: init v1 (even docs), MERGE the
    * odd docs (deduped per fingerprint, max doc_id wins) as v2, then
    * read BOTH versions through the same manifest machinery — version 1
    * must still return the pre-merge snapshot bit-for-bit. Each
    * snapshot is summarized as (rows, stream rows, order-independent
    * content XOR), so the oracle's replay of "v1 = evens, v2 = anti-join
    * + union" hash-checks that time travel neither leaks v2 rows into
    * v1 nor loses v1 files. */
  def qTimeTravel(s: SparkSession, d: String): DataFrame = {
    val dir = LakeFixtures.cloneOf(s,
      LakeFixtures.docsEvensFp(s, d), "graft_travel")
    try {
      val all = fpDocs(s, d)
      val w = Window.partitionBy("fp").orderBy(col("doc_id").desc)
      val batch = all.filter(col("doc_id") % 2 === 1)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1).drop("rk")
      Versioned.merge(batch, dir, Seq("fp"))
      def summarize(v: Long): (Long, Long, Long, Long) = {
        val r = Versioned.read(s, dir, Some(v))
          .select(shiftrightunsigned(Dedup.md5Hash64(
            concat_ws("#", col("doc_id").cast("string"), col("fp"))), 4)
            .as("h"), col("doc_id"))
          .agg(count(lit(1)), sum(when(col("doc_id") % 2 === 1, 1L)
            .otherwise(0L)), expr("bit_xor(h)")).head()
        (v, r.getLong(0), r.getLong(1), r.getLong(2))
      }
      import s.implicits._
      Seq(summarize(1L), summarize(2L))
        .toDF("version", "n_rows", "n_from_batch", "content_xor")
        .orderBy("version")
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  // ---- quality-weighted deterministic sampling ----

  /** Bernoulli sampling with P(keep) = the doc's rounded quality score,
    * decided by a cross-engine md5 uniform: u = (md5(doc_id) >> 4) /
    * 2^60 ∈ [0,1). Both engines compute the identical 60-bit integer,
    * the identical IEEE double conversion, and the identical compare —
    * so the sample is REPRODUCIBLE (same corpus → same sample,
    * regardless of cluster size or engine), which is what makes a
    * quality-weighted mixture auditable. Map-only; no shuffle beyond
    * the final per-source rollup. */
  def qWeightedSample(s: SparkSession, d: String): DataFrame = {
    val q = round(TextStats.qualityScore(col("text")), 6)
    val u = shiftrightunsigned(Dedup.md5Hash64(col("doc_id").cast("string")), 4)
      .cast("double") / lit(TWO60).cast("double")
    docs(s, d)
      .select(col("source"), q.as("q"), (u < q).as("keep"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_sampled"),
        round(Q.dsum(col("q")), 6).as("expected"),
        round(sum(when(col("keep"), 1L).otherwise(0L)).cast("double")
          / count(lit(1)), 6).as("rate"))
      .orderBy("source")
  }

  // ---- robust statistics ----

  /** Exact order-statistics profile of `n_chars` per source: median
    * (middle-rank average), MAD (median absolute deviation), 10%
    * trimmed mean, and 10% winsorized mean with its clamp values. Rank
    * logic is integer (row_number over a deterministic (x, doc_id)
    * order), sums are exact longs on integer or half-integer grids, so
    * every output is bit-identical cross-engine. Scale: one sort per
    * source group — the exact twin of the approx-percentile sketch path
    * (`q_approx_percentile`), for when the group count is the bounded
    * dimension and per-group exactness is the product. */
  def qRobustStats(s: SparkSession, d: String): DataFrame = {
    val sw = Window.partitionBy("source")
    val ow = Window.partitionBy("source").orderBy(col("x"), col("doc_id"))
    val base = docs(s, d)
      .select(col("source"), col("doc_id"), col("n_chars").cast("long").as("x"))
      .withColumn("rn", row_number().over(ow))
      .withColumn("n", count(lit(1)).over(sw))
      .withColumn("k", expr("n div 10"))
      // median = mean of the middle one/two ranks: 2·rn ∈ [n, n+2]
      .withColumn("med",
        (sum(when(col("rn") * 2 >= col("n") && col("rn") * 2 <= col("n") + 2,
          col("x"))).over(sw).cast("double")
          / count(when(col("rn") * 2 >= col("n") && col("rn") * 2 <= col("n") + 2,
            lit(1))).over(sw)))
      .withColumn("lo_cap", max(when(col("rn") <= col("k") + 1, col("x"))).over(sw))
      .withColumn("hi_cap", min(when(col("rn") >= col("n") - col("k"), col("x"))).over(sw))
      .withColumn("dev", abs(col("x").cast("double") - col("med")))
    val dw = Window.partitionBy("source")
      .orderBy(col("dev"), col("x"), col("doc_id"))
    val ranked = base.withColumn("rn2", row_number().over(dw))
    ranked.groupBy("source")
      .agg(max(col("n")).as("n"),
        round(max(col("med")), 6).as("median"),
        round(sum(when(col("rn2") * 2 >= col("n") && col("rn2") * 2 <= col("n") + 2,
            col("dev"))) / count(when(col("rn2") * 2 >= col("n")
            && col("rn2") * 2 <= col("n") + 2, lit(1))), 6).as("mad"),
        round(sum(col("x")).cast("double") / max(col("n")), 6).as("mean"),
        round(sum(when(col("rn") > col("k") && col("rn") <= col("n") - col("k"),
            col("x"))).cast("double")
          / (max(col("n")) - lit(2) * max(col("k"))), 6).as("trimmed_mean"),
        round(sum(when(col("rn") <= col("k"), col("lo_cap"))
            .when(col("rn") > col("n") - col("k"), col("hi_cap"))
            .otherwise(col("x"))).cast("double") / max(col("n")), 6)
          .as("winsor_mean"),
        max(col("lo_cap")).as("lo_cap"),
        max(col("hi_cap")).as("hi_cap"))
      .orderBy("source")
  }

  // ---- readability ----

  /** Flesch-style reading ease from cheap deterministic counts:
    * sentences = runs of terminal punctuation, syllables = vowel-group
    * runs (the standard heuristic), words = whitespace tokens. Scored
    * row-locally in identical IEEE arithmetic both engines; docs with
    * no words get a NULL score and the 'empty' band. A real curation
    * filter keeps the middle bands — boilerplate scores artificially
    * "easy", OCR noise "hard". */
  def qReadability(s: SparkSession, d: String): DataFrame = {
    // coalesce NULL text to '' up front: Spark's greatest() skips NULLs
    // while DuckDB's returns NULL, so a NULL must never reach the counts
    val txt = coalesce(col("text"), lit(""))
    val wc = TextStats.tokenCount(txt).cast("long")
    val sc = greatest(size(regexp_extract_all(txt,
      lit("[.!?]+"), lit(0))).cast("long"), lit(1L))
    val syl = greatest(size(regexp_extract_all(lower(txt),
      lit("[aeiouy]+"), lit(0))).cast("long"), lit(1L))
    val flesch = lit(206.835) -
      lit(1.015) * (col("n_words").cast("double") / col("n_sentences")) -
      lit(84.6) * (col("n_syllables").cast("double") / col("n_words"))
    docs(s, d)
      .select(col("doc_id"), wc.as("n_words"), sc.as("n_sentences"),
        syl.as("n_syllables"))
      .withColumn("flesch",
        when(col("n_words") > 0, round(flesch, 6)))
      .withColumn("band",
        when(col("flesch").isNull, lit("empty"))
          .when(col("flesch") >= 90, lit("very_easy"))
          .when(col("flesch") >= 60, lit("standard"))
          .when(col("flesch") >= 30, lit("difficult"))
          .otherwise(lit("very_difficult")))
      .orderBy("doc_id")
  }

  // ---- positional inverted index ----

  /** Positional posting lists for the corpus's top-20 terms by document
    * frequency: df, collection frequency, mean position, and an
    * order-independent XOR fingerprint over every (term, doc, position)
    * posting — the cross-engine proof that the full positional
    * structure (not just the counts) matches. Build is one explode +
    * one agg: the same shuffle a real index build pays, with the
    * posting payload reduced map-side. */
  def qInvertedIndex(s: SparkSession, d: String): DataFrame = {
    val postings = docs(s, d)
      .select(col("doc_id"),
        posexplode(TextStats.tokens(coalesce(col("text"), lit("")))))
      .select(col("doc_id"), col("col").as("term"),
        (col("pos") + 1).cast("long").as("p"))
    val agg = postings
      .withColumn("h", shiftrightunsigned(Dedup.md5Hash64(
        concat_ws("#", col("term"), col("doc_id").cast("string"),
          col("p").cast("string"))), 4))
      .groupBy("term")
      .agg(countDistinct(col("doc_id")).as("df"),
        count(lit(1)).as("cf"),
        round(sum(col("p")).cast("double") / count(lit(1)), 6).as("avg_pos"),
        expr("bit_xor(h)").as("postings_xor"))
    val w = Window.orderBy(col("df").desc, col("term"))
    agg.withColumn("rk", row_number().over(w)).filter(col("rk") <= 20)
      .select(col("rk"), col("term"), col("df"), col("cf"), col("avg_pos"),
        col("postings_xor"))
      .orderBy("rk")
  }

  // ---- length-bucketed batching ----

  /** Power-of-two ladder shared by both engines. Docs land in the first
    * rung ≥ their token count; longer docs overflow to the top rung
    * (where a real batcher would truncate or split). */
  private val lengthLadder = Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L,
    2048L, 4096L, 8192L)

  /** Padding-waste accounting for length-bucketed batching: per ladder
    * rung, how many docs land there, their real token mass, the padded
    * mass a fixed-length batcher allocates, and the waste ratio — the
    * number that justifies (or kills) a bucketing policy before anyone
    * burns GPU-hours on it. Row-local bucketing + one small agg. */
  def qLengthBuckets(s: SparkSession, d: String): DataFrame = {
    val n = TextStats.tokenCount(coalesce(col("text"), lit(""))).cast("long")
    val bucket = lengthLadder.reverse.tail.foldLeft(
      lit(lengthLadder.last): org.apache.spark.sql.Column) { (els, edge) =>
      when(col("n_tokens") <= edge, lit(edge)).otherwise(els)
    }
    docs(s, d).select(col("doc_id"), n.as("n_tokens"))
      .withColumn("bucket", bucket)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        (count(lit(1)) * max(col("bucket"))).as("n_padded"),
        round(lit(1.0) - sum(col("n_tokens")).cast("double")
          / (count(lit(1)) * max(col("bucket"))), 6).as("waste_ratio"))
      .orderBy("bucket")
  }

  // ---- registry ----

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_merge"    -> qStreamMerge,
    "q_time_travel"     -> qTimeTravel,
    "q_weighted_sample" -> qWeightedSample,
    "q_robust_stats"    -> qRobustStats,
    "q_readability"     -> qReadability,
    "q_inverted_index"  -> qInvertedIndex,
    "q_length_buckets"  -> qLengthBuckets)

  /** Shared oracle CTE: (doc_id, source, fp, batch). */
  private val FP_CTE =
    s"""fp AS (SELECT doc_id, source,
       |  ${TextStats.FINGERPRINT("coalesce(text, '')")} AS f,
       |  doc_id % 3 AS b FROM documents)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_stream_merge" ->
      s"""WITH $FP_CTE,
         |lake AS (SELECT doc_id, source, f FROM fp WHERE doc_id % 2 = 0),
         |odds AS (SELECT doc_id, source, f, b FROM fp WHERE doc_id % 2 = 1),
         |bd AS (SELECT *, row_number() OVER (PARTITION BY b, f
         |         ORDER BY doc_id DESC) AS rk FROM odds),
         |obd AS (SELECT doc_id, source, f, b FROM bd WHERE rk = 1),
         |w AS (SELECT *, row_number() OVER (PARTITION BY f
         |        ORDER BY b DESC, doc_id DESC) AS rk2 FROM obd),
         |win AS (SELECT doc_id, source, f FROM w WHERE rk2 = 1),
         |final AS (
         |  SELECT doc_id, source FROM win
         |  UNION ALL
         |  SELECT doc_id, source FROM lake
         |  WHERE f NOT IN (SELECT f FROM win))
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_from_stream,
         |  CAST(4 AS BIGINT) AS n_versions
         |FROM final GROUP BY source ORDER BY source""".stripMargin,
    "q_time_travel" ->
      s"""WITH $FP_CTE,
         |lake AS (SELECT doc_id, source, f FROM fp WHERE doc_id % 2 = 0),
         |odds AS (SELECT doc_id, source, f FROM fp WHERE doc_id % 2 = 1),
         |bd AS (SELECT *, row_number() OVER (PARTITION BY f
         |         ORDER BY doc_id DESC) AS rk FROM odds),
         |win AS (SELECT doc_id, source, f FROM bd WHERE rk = 1),
         |v1 AS (SELECT doc_id, f FROM lake),
         |v2 AS (
         |  SELECT doc_id, f FROM win
         |  UNION ALL
         |  SELECT doc_id, f FROM lake WHERE f NOT IN (SELECT f FROM win)),
         |s1 AS (SELECT CAST(1 AS BIGINT) AS version, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_from_batch,
         |  CAST(bit_xor(md5_number_upper(
         |    CAST(doc_id AS VARCHAR) || '#' || f) >> 4) AS BIGINT)
         |    AS content_xor FROM v1),
         |s2 AS (SELECT CAST(2 AS BIGINT) AS version, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_from_batch,
         |  CAST(bit_xor(md5_number_upper(
         |    CAST(doc_id AS VARCHAR) || '#' || f) >> 4) AS BIGINT)
         |    AS content_xor FROM v2)
         |SELECT * FROM s1 UNION ALL SELECT * FROM s2 ORDER BY version""".stripMargin,
    "q_weighted_sample" ->
      s"""WITH t AS (SELECT doc_id, source, $T AS toks, text FROM documents),
         |sc AS (SELECT source,
         |  round(${PipelineQueries.QUALITY("text", "toks")}, 6) AS q,
         |  CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) >> 4 AS DOUBLE)
         |    / CAST(1152921504606846976 AS DOUBLE) < round(
         |      ${PipelineQueries.QUALITY("text", "toks")}, 6) AS keep
         |  FROM t)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
         |  round(${Q.DSUM("q")}, 6) AS expected,
         |  round(CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 6) AS rate
         |FROM sc GROUP BY source ORDER BY source""".stripMargin,
    "q_robust_stats" ->
      """WITH base AS (
        |  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS x FROM documents),
        |r AS (SELECT *,
        |  row_number() OVER (PARTITION BY source ORDER BY x, doc_id) AS rn,
        |  count(*) OVER (PARTITION BY source) AS n
        |  FROM base),
        |r2 AS (SELECT *, n // 10 AS k,
        |  CAST(sum(CASE WHEN rn * 2 >= n AND rn * 2 <= n + 2 THEN x END)
        |      OVER (PARTITION BY source) AS DOUBLE)
        |    / count(CASE WHEN rn * 2 >= n AND rn * 2 <= n + 2 THEN 1 END)
        |      OVER (PARTITION BY source) AS med,
        |  max(CASE WHEN rn <= n // 10 + 1 THEN x END)
        |    OVER (PARTITION BY source) AS lo_cap,
        |  min(CASE WHEN rn >= n - n // 10 THEN x END)
        |    OVER (PARTITION BY source) AS hi_cap
        |  FROM r),
        |r3 AS (SELECT *, abs(CAST(x AS DOUBLE) - med) AS dev,
        |  row_number() OVER (PARTITION BY source ORDER BY
        |    abs(CAST(x AS DOUBLE) - med), x, doc_id) AS rn2
        |  FROM r2)
        |SELECT source, max(n) AS n,
        |  round(max(med), 6) AS median,
        |  round(sum(CASE WHEN rn2 * 2 >= n AND rn2 * 2 <= n + 2 THEN dev END)
        |    / count(CASE WHEN rn2 * 2 >= n AND rn2 * 2 <= n + 2 THEN 1 END), 6)
        |    AS mad,
        |  round(CAST(sum(x) AS DOUBLE) / max(n), 6) AS mean,
        |  round(CAST(sum(CASE WHEN rn > k AND rn <= n - k THEN x END)
        |    AS DOUBLE) / (max(n) - 2 * max(k)), 6) AS trimmed_mean,
        |  round(CAST(sum(CASE WHEN rn <= k THEN lo_cap
        |    WHEN rn > n - k THEN hi_cap ELSE x END) AS DOUBLE) / max(n), 6)
        |    AS winsor_mean,
        |  max(lo_cap) AS lo_cap, max(hi_cap) AS hi_cap
        |FROM r3 GROUP BY source ORDER BY source""".stripMargin,
    "q_readability" ->
      s"""WITH c AS (SELECT doc_id,
         |  CAST(len(${TextStats.TOKENS("coalesce(text, '')")}) AS BIGINT)
         |    AS n_words,
         |  greatest(CAST(len(regexp_extract_all(coalesce(text, ''),
         |    '[.!?]+')) AS BIGINT), 1) AS n_sentences,
         |  greatest(CAST(len(regexp_extract_all(lower(coalesce(text, '')),
         |    '[aeiouy]+')) AS BIGINT), 1) AS n_syllables
         |  FROM documents),
         |sc AS (SELECT *,
         |  CASE WHEN n_words > 0 THEN round(206.835
         |    - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
         |    - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6) END AS flesch
         |  FROM c)
         |SELECT doc_id, n_words, n_sentences, n_syllables, flesch,
         |  CASE WHEN flesch IS NULL THEN 'empty'
         |       WHEN flesch >= 90 THEN 'very_easy'
         |       WHEN flesch >= 60 THEN 'standard'
         |       WHEN flesch >= 30 THEN 'difficult'
         |       ELSE 'very_difficult' END AS band
         |FROM sc ORDER BY doc_id""".stripMargin,
    "q_inverted_index" ->
      s"""WITH t AS (SELECT doc_id,
         |  ${TextStats.TOKENS("coalesce(text, '')")} AS toks FROM documents),
         |pos AS (SELECT doc_id, toks,
         |          unnest(range(1, len(toks) + 1)) AS p FROM t),
         |post AS (SELECT doc_id, toks[p] AS term, CAST(p AS BIGINT) AS p
         |         FROM pos),
         |agg AS (SELECT term, count(DISTINCT doc_id) AS df,
         |  count(*) AS cf,
         |  round(CAST(sum(p) AS DOUBLE) / count(*), 6) AS avg_pos,
         |  CAST(bit_xor(md5_number_upper(term || '#'
         |    || CAST(doc_id AS VARCHAR) || '#' || CAST(p AS VARCHAR)) >> 4)
         |    AS BIGINT) AS postings_xor
         |  FROM post GROUP BY term),
         |rk AS (SELECT *, row_number() OVER (ORDER BY df DESC, term) AS rk
         |       FROM agg)
         |SELECT CAST(rk AS BIGINT) AS rk, term, df, cf, avg_pos, postings_xor
         |FROM rk WHERE rk <= 20 ORDER BY rk""".stripMargin,
    "q_length_buckets" -> {
      val caseExpr = lengthLadder.init
        .map(e => s"WHEN n_tokens <= $e THEN $e")
        .mkString("CASE ", " ", s" ELSE ${lengthLadder.last} END")
      s"""WITH t AS (SELECT doc_id,
         |  CAST(len(${TextStats.TOKENS("coalesce(text, '')")}) AS BIGINT)
         |    AS n_tokens FROM documents),
         |b AS (SELECT doc_id, n_tokens, $caseExpr AS bucket FROM t)
         |SELECT bucket, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(count(*) * max(bucket) AS BIGINT) AS n_padded,
         |  round(1.0 - CAST(sum(n_tokens) AS DOUBLE)
         |    / (count(*) * max(bucket)), 6) AS waste_ratio
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
    })
}
