package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer.
  *
  * Token counts drive sequence packing, mixture weights, and LM-score
  * normalization — and a whitespace count can be 3–5× off what a
  * trainer's subword tokenizer actually sees. Split like a real
  * tokenizer stack:
  *
  *  - '''fit''' ([[fit]] / [[fitOnCorpus]]): learn merge rules from
  *    word frequencies. On a corpus this runs over a deterministic
  *    hash sample ([[graft.ops.Sampling.hashBucket]]) with the word
  *    vocabulary capped by frequency — Heaps' law keeps the collect
  *    bounded at any corpus size, and coarse merge statistics need
  *    only a sample (the IVF-quantizer lesson). The fit itself is
  *    driver-side pure Scala: iterative argmax over pair counts,
  *    ties broken by the lexicographically smallest pair, so the
  *    merge list is reproducible anywhere.
  *  - '''apply''' ([[tokenCount]] / [[applied]]): row-local merge
  *    replay, no UDF. A word becomes its space-joined code points
  *    (boundary spaces included), then each merge (a, b) → ab is TWO
  *    literal `replace` passes of `" a b "` → `" ab "`: one leftmost
  *    non-overlapping pass can skip an occurrence whose leading space
  *    the previous match consumed, but never leaves two ADJACENT
  *    unmerged occurrences, so the second pass is exhaustive.
  *    DECLARED left-greedy semantics (a run like `aaaaa` segments
  *    [aa, a, aa], not canonical BPE's [aa, aa, a]) — deterministic,
  *    and the DuckDB twin replays the identical replace chain, so
  *    both engines compute the same function by construction.
  *
  * The REGISTRY query applies [[shipped]] — a merge table fitted once
  * from a compile-time seed text, the way production tokenizers ship
  * as fixed artifacts — which keeps the oracle SQL static; corpus
  * fitting stays a library call (`BpeSpec` proves determinism and
  * compression on the real corpus).
  */
object Bpe {

  /** Unicode-code-point symbols (surrogate-safe — Java `split("")`
    * would shear emoji into half-pairs that DuckDB's code-point model
    * never sees). */
  private def codePoints(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Learn `nMerges` merge rules from (word, count) frequencies.
    * Deterministic: pick the adjacent symbol pair with the highest
    * total count, ties to the lexicographically smallest (a, b); stop
    * early when no pair repeats. Fit-internal segmentation uses the
    * canonical greedy left-to-right scan — it only shapes the merge
    * STATISTICS; application semantics are [[applied]]'s. */
  def fit(wordCounts: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    var segs: Vector[(Vector[String], Long)] =
      wordCounts.map { case (w, c) => codePoints(w) -> c }.toVector
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var k = 0
    while (k < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      segs.foreach { case (seg, c) =>
        var i = 0
        while (i + 1 < seg.length) {
          val p = (seg(i), seg(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      val best = counts.filter(_._2 > 1).toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case None => done = true
        case Some(((a, b), _)) =>
          merges += ((a, b))
          val ab = a + b
          segs = segs.map { case (seg, c) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < seg.length) {
              if (i + 1 < seg.length && seg(i) == a && seg(i + 1) == b) {
                out += ab; i += 2
              } else { out += seg(i); i += 1 }
            }
            (out.result(), c)
          }
      }
      k += 1
    }
    merges.result()
  }

  /** [[fit]] over a corpus: deterministic hash sample of the docs
    * (expected ≤ `maxFitDocs`), one explode+groupBy for word counts,
    * vocabulary capped at `vocabCap` by (count desc, word asc) before
    * the driver collect. */
  def fitOnCorpus(docs: DataFrame, nMerges: Int = 48,
      vocabCap: Int = 10000, maxFitDocs: Long = 100000): Seq[(String, String)] = {
    val n = docs.count()
    val sampled =
      if (n <= maxFitDocs) docs
      else {
        val permille = math.max(1L, maxFitDocs * 1000L / n)
        docs.where(
          graft.ops.Sampling.hashBucket(col("doc_id"), 1000) < lit(permille))
      }
    val words = sampled.repartition(col("doc_id"))
      .select(explode(TextStats.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(vocabCap)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    fit(words, nMerges)
  }

  /** Merge table fitted once from a fixed seed text (generic English
    * prose written for this purpose) — the artifact the registry
    * query and its static oracle share. */
  val seedText: String =
    """the quick brown fox jumps over the lazy dog while the rain in
      |spain falls mainly on the plain and the early bird catches the
      |worm because practice makes perfect and actions speak louder
      |than words so the pen is mightier than the sword when there is
      |smoke there is fire and every cloud has a silver lining with
      |time and patience the mulberry leaf becomes a silk gown the
      |data in the table was filtered and grouped and counted and the
      |report was written and the model was trained on the corpus of
      |documents and the tokens were counted and packed into batches
      |""".stripMargin.replace("\n", " ")

  val shippedMergeCount = 48

  lazy val shipped: Seq[(String, String)] = fit(
    seedText.split(" ").filter(_.nonEmpty).groupBy(identity)
      .map { case (w, ws) => w -> ws.length.toLong }.toSeq
      .sortBy(_._1), shippedMergeCount)

  /** Word → space-joined BPE tokens (boundary spaces kept): the
    * literal two-pass replace chain described in the object doc. */
  def applied(word: Column, merges: Seq[(String, String)]): Column = {
    val init = concat(lit(" "),
      array_join(regexp_extract_all(word, lit("(?s)."), lit(0)), " "),
      lit(" "))
    merges.foldLeft(init) { case (c, (a, b)) =>
      val pat = lit(s" $a $b "); val rep = lit(s" $a$b ")
      replace(replace(c, pat, rep), pat, rep)
    }
  }

  /** Per-document BPE token count: Σ over whitespace words of the
    * word's merged-symbol count. Row-local (the merge table is plan
    * literals — broadcast by construction). */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    coalesce(aggregate(
      transform(TextStats.tokens(text),
        w => size(split(trim(applied(w, merges)), " ")).cast("long")),
      lit(0L), (acc, x) => acc + x), lit(0L))

  // ---- DuckDB twins (generated from the same merge list) ----

  private def sq(s: String): String = s.replace("'", "''")

  def APPLIED(e: String, merges: Seq[(String, String)]): String = {
    val init = s"(' ' || array_to_string(regexp_extract_all($e, '(?s).'), ' ') || ' ')"
    merges.foldLeft(init) { case (acc, (a, b)) =>
      val pat = sq(s" $a $b "); val rep = sq(s" $a$b ")
      s"replace(replace($acc, '$pat', '$rep'), '$pat', '$rep')"
    }
  }

  def TOKEN_COUNT(e: String, merges: Seq[(String, String)]): String =
    s"""CAST(coalesce(list_sum(list_transform(${TextStats.TOKENS(e)},
       |  w -> CAST(len(string_split(trim(${APPLIED("w", merges)}), ' ')) AS BIGINT))),
       |  0) AS BIGINT)""".stripMargin
}
