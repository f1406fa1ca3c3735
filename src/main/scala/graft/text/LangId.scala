package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Hashed character-n-gram language-ID classifier — the model-based
  * upgrade of [[TextStats.predictedLang]]'s stopword heuristic (the
  * round-7 verdict's top gap: the first gate of a multilingual crawl).
  *
  * Shape (fastText-class, but fully oracle-replayable):
  *  - features: character 3-grams of the lowercased text, hashed into
  *    [[buckets]] buckets via the cross-engine md5-64
  *    ([[Dedup.md5Hash64]] ↔ DuckDB `md5_number_upper`); the bucket is
  *    the LOW bits (power-of-two `AND` mask), so the signed/unsigned
  *    difference between the engines cannot matter;
  *  - model: multinomial Naive Bayes with add-one smoothing over the
  *    hashed buckets, trained IN-PLAN on the labeled split (one
  *    groupBy(lang, bucket) count — no driver-side fit at all, so the
  *    training pass scales exactly like any other aggregation at
  *    100 TB; the model itself is ≤ langs × buckets rows and is
  *    BROADCAST to the scoring join);
  *  - scoring: per-doc Σ cnt(bucket) · Q(log p(bucket|lang)) + Q(log
  *    prior), where Q quantizes each log-prob to the 1e-6 integer grid
  *    (`floor(x·1e6 + 0.5)` as BIGINT) — the sum is EXACT integer
  *    arithmetic, so scores are bit-identical across engines,
  *    partition layouts and AQE replans, and the argmax (ties broken
  *    by [[TextStats.langs]] order) is deterministic. The only float
  *    step is `ln` itself; the 1e-6 grid keeps a 2-ulp `ln`
  *    disagreement ~1e9× away from a rounding boundary (same budget
  *    argument as `q_lm_score`).
  *
  * The synthetic corpus carries no real language signal (the text is
  * the same English-ish word salad for every `lang` label — measured),
  * so the multilingual signal is CONSTRUCTED deterministically in BOTH
  * engines, the `q_text_normalize` trick at corpus scale: each doc is
  * augmented with 8 function words drawn from its label's [[vocab]] by
  * a doc_id-seeded index sequence. That also delivers the verdict's
  * stretch item (scripted multilingual fixtures, oracle-replayable).
  *
  * 100 TB shape: gram explode is row-local inside the scan; the two
  * shuffles are groupBy(doc_id, bucket) and groupBy(doc_id, lang) —
  * both uniform keys (md5 buckets / bounded lang fan-out); the model
  * and the 5-row lang-stats frames ride broadcast joins.
  */
object LangId {

  val langs: Seq[String] = TextStats.langs

  /** 12 common function words per language, all lowercase (so the
    * lowercasing pass never touches the non-ASCII letters — keeps the
    * two engines' Unicode case tables out of the contract). Distinct
    * from (but overlapping) the heuristic's stopword lists, so the
    * heuristic stays a fair baseline rather than a tautology. */
  val vocab: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "that", "with", "have", "this", "from",
      "they", "would", "there", "their", "about"),
    "de" -> Seq("der", "die", "und", "nicht", "sich", "mit", "auf",
      "für", "werden", "auch", "nach", "über"),
    "es" -> Seq("el", "la", "que", "los", "del", "las", "por", "con",
      "una", "para", "como", "más"),
    "fr" -> Seq("le", "les", "des", "une", "dans", "pour", "qui",
      "avec", "sur", "pas", "plus", "être"),
    "zh" -> Seq("de5", "shi4", "bu4", "le5", "ren2", "wo3", "zai4",
      "you3", "ta1", "zhe4", "men5", "guo2"))

  /** Hash-bucket count. Power of two, so bucket = low bits of the
    * md5-64 bit pattern in both engines. */
  val buckets: Int = 2048

  /** Augmentation draw count and strides (stride 5 is coprime to 12 →
    * the drawn subset rotates per doc). */
  val draws: Int = 8

  private val trainMod = 10
  private val trainLt = 7

  /** log-prob → 1e-6 integer grid — shared impl ([[Quantize]]). */
  private def q6(c: Column): Column = Quantize.q6(c)

  private def Q6(e: String): String = Quantize.Q6(e)

  /** Deterministic per-label augmentation: text + 8 vocab words chosen
    * by `(doc_id·7 + i·5) mod 12`. */
  def augCol(text: Column, lang: Column, docId: Column): Column = {
    val arr = langs.tail.foldLeft(
      when(lang === langs.head, array(vocab(langs.head).map(lit): _*))) {
      (acc, l) => acc.when(lang === l, array(vocab(l).map(lit): _*))
    }
    val words = transform(sequence(lit(0), lit(draws - 1)), i =>
      element_at(arr, ((docId * 7 + i * 5) % 12).cast("int") + 1))
    concat(text, lit(" "), concat_ws(" ", words))
  }

  /** (doc_id, lang, aug, is_train) over the documents table.
    *
    * The trailing `repartition(doc_id)` is a deliberate exchange
    * BARRIER: downstream consumers (the stopword heuristic is ~20
    * expression references to `aug`; higher-order functions evaluate
    * interpreted, with no cross-reference subexpression elimination)
    * would otherwise re-run the whole augmentation construction per
    * reference — measured as a 15 s bench outlier at sf0.1 vs sub-s
    * after the barrier. One narrow shuffle of the doc rows buys
    * compute-once semantics at any scale (the `qMixtureWeights`
    * idiom). */
  def augmented(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      augCol(col("text"), col("lang"), col("doc_id")).as("aug"),
      (col("doc_id") % trainMod < trainLt).as("is_train"))
      .repartition(col("doc_id"))

  /** The md5 bucket, as the LOW 11 bits of [[Dedup.md5Hash64]]'s
    * little-endian assembly (shared impl — [[Quantize.bucket]];
    * bit-equality spec-pinned, measured ~1.4 s/pass at sf0.1). */
  private def bucketCol(g: Column): Column = Quantize.bucket(g, buckets)

  /** Per-doc NB prediction (doc_id, lang_model) — trains on the
    * `is_train` rows of `aug`, scores every row.
    *
    * ONE gram pass: the char-gram explosion collapses map-side into
    * the per-doc bucket-count frame (`docBuckets`), and BOTH the
    * training counts and the scoring join read that compact frame —
    * its exchange is planned once and reused (ReuseExchange), so the
    * corpus-sized explode+hash work is never run twice. (The first
    * cut re-exploded grams for training; at sf0.1 that alone doubled
    * the query. Deriving counts from docBuckets is also strictly
    * less shuffle at any scale: Σ min(len, buckets) rows per doc vs
    * one row per gram.) */
  def predictions(aug: DataFrame): DataFrame = {
    // lowercase ONCE into a materialized attribute before the gram
    // lambda — `lower(aug)` inside the transform body would re-run
    // over the whole document per gram (O(len²) per row)
    val docBuckets = aug
      .select(col("doc_id"), col("lang"), col("is_train"),
        lower(col("aug")).as("la"))
      .select(col("doc_id"), col("lang"), col("is_train"),
        explode(transform(
          sequence(lit(1), greatest(length(col("la")) - 2, lit(1))),
          i => col("la").substr(i, lit(3)))).as("g"))
      .select(col("doc_id"), col("lang"), col("is_train"),
        bucketCol(col("g")).as("b"))
      .groupBy("doc_id", "lang", "is_train", "b")
      .agg(count(lit(1)).as("cnt"))
      // the diamond: training counts AND the scoring probe read this
      // frame; without a cache each branch re-runs the corpus-sized
      // explode+hash (exchange reuse does not fire across the two
      // differently-shaped consumers — measured). The cached frame is
      // the COMPACT per-doc summary (≤ min(len, buckets) rows/doc),
      // not the raw grams; at cluster scale it spills per-partition
      // like any MEMORY_AND_DISK frame. Bench clears caches per query.
      .cache()
    val counts = docBuckets.filter(col("is_train"))
      .groupBy("lang", "b").agg(sum(col("cnt")).as("c"))
    val totals = counts.groupBy("lang").agg(sum(col("c")).as("n"))
    val priors = aug.filter(col("is_train"))
      .groupBy("lang").agg(count(lit(1)).as("dn"))
    val ptot = priors.agg(sum(col("dn")).as("dtot"))
    val langStats = totals.join(priors, "lang").crossJoin(broadcast(ptot))
      .select(col("lang"), col("n"),
        q6(log(col("dn").cast("double") / col("dtot"))).as("prior_q"),
        q6(log(lit(1.0) / (col("n") + lit(buckets)))).as("default_q"))
    val model = langStats
      .select(col("lang"), col("n"), col("prior_q"), col("default_q"),
        explode(sequence(lit(0L), lit((buckets - 1).toLong))).as("b"))
      .join(counts, Seq("lang", "b"), "left")
      .select(col("lang"), col("b"), col("prior_q"),
        coalesce(q6(log((col("c") + lit(1.0)) / (col("n") + lit(buckets)))),
          col("default_q")).as("q"))
    val pri = langs.zipWithIndex.tail.foldLeft(
      when(col("lang") === langs.head, lit(0))) { case (acc, (l, i)) =>
      acc.when(col("lang") === l, lit(i))
    }
    docBuckets.select(col("doc_id"), col("b"), col("cnt"))
      .join(broadcast(model), "b")
      .groupBy("doc_id", "lang")
      .agg((sum(col("cnt") * col("q")) + first(col("prior_q"))).as("score"))
      .groupBy("doc_id")
      .agg(max(struct(col("score"), (-pri).as("neg_pri"), col("lang")))
        .as("best"))
      .select(col("doc_id"), col("best.lang").as("lang_model"))
  }

  // ---- DuckDB twins (generated from the same constants) ----

  private def lst(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ",", "]")

  private def vocabCase: String =
    "CASE lang " +
      langs.map(l => s"WHEN '$l' THEN ${lst(vocab(l))}").mkString(" ") + " END"

  /** The augmented-corpus CTE (named `a`), FROM documents. */
  def AUG_CTE: String =
    s"""a AS (
       |  SELECT doc_id, lang,
       |    text || ' ' || array_to_string(
       |      list_transform(generate_series(0, ${draws - 1}),
       |        i -> ($vocabCase)[CAST((doc_id * 7 + i * 5) % 12 AS INTEGER) + 1]),
       |      ' ') AS aug,
       |    (doc_id % $trainMod < $trainLt) AS is_train
       |  FROM documents)""".stripMargin

  /** The NB train+score CTE chain; expects `a` in scope, ends with
    * `pred(doc_id, lang_model)`. */
  def NB_CTES: String = {
    val priCase = "CASE lang " +
      langs.zipWithIndex.map { case (l, i) => s"WHEN '$l' THEN $i" }
        .mkString(" ") + " END"
    s"""g AS (
       |  SELECT doc_id, lang, is_train,
       |    CAST(md5_number_upper(substr(lower(aug), CAST(i AS INTEGER), 3))
       |      % $buckets AS BIGINT) AS b
       |  FROM a, unnest(generate_series(1, greatest(length(aug) - 2, 1))) AS t(i)),
       |nbc AS (SELECT lang, b, count(*) AS c FROM g WHERE is_train
       |        GROUP BY lang, b),
       |nbt AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM nbc
       |        GROUP BY lang),
       |nbp AS (SELECT lang, count(*) AS dn FROM a WHERE is_train
       |        GROUP BY lang),
       |nbpt AS (SELECT CAST(sum(dn) AS BIGINT) AS dtot FROM nbp),
       |nbls AS (
       |  SELECT t.lang, t.n,
       |    ${Q6("ln(CAST(p.dn AS DOUBLE) / pt.dtot)")} AS prior_q,
       |    ${Q6(s"ln(1.0 / (t.n + $buckets))")} AS default_q
       |  FROM nbt t JOIN nbp p ON p.lang = t.lang CROSS JOIN nbpt pt),
       |nbm AS (
       |  SELECT ls.lang, bb.b, ls.prior_q,
       |    coalesce(${Q6(s"ln((c + 1.0) / (ls.n + $buckets))")}, ls.default_q)
       |      AS q
       |  FROM nbls ls
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${buckets - 1})) AS b) bb
       |  LEFT JOIN nbc c ON c.lang = ls.lang AND c.b = bb.b),
       |docb AS (SELECT doc_id, b, count(*) AS cnt FROM g
       |         GROUP BY doc_id, b),
       |nbsc AS (
       |  SELECT d.doc_id, m.lang,
       |    CAST(sum(d.cnt * m.q) AS BIGINT) + any_value(m.prior_q) AS score
       |  FROM docb d JOIN nbm m ON m.b = d.b
       |  GROUP BY d.doc_id, m.lang),
       |pred AS (
       |  SELECT doc_id, lang AS lang_model FROM (
       |    SELECT doc_id, lang, row_number() OVER (
       |      PARTITION BY doc_id ORDER BY score DESC, $priCase ASC) AS rn
       |    FROM nbsc) WHERE rn = 1)""".stripMargin
  }
}
