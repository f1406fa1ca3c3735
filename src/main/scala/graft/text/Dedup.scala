package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines, each designed
  * around its 100 TB shuffle profile:
  *
  *  - '''exact''': hash-groupBy on a canonical fingerprint — one shuffle
  *    keyed by a 128-bit hash; no skew (hash keys are uniform).
  *  - '''n-gram Jaccard''' (exact near-dup): shingle explode + self-join
  *    on shingle. Quadratic in the worst case — correct baseline and the
  *    ORACLE for the approximate methods, but the join on hot shingles
  *    skews at scale; that's precisely what MinHash/LSH replaces.
  *  - '''MinHash + LSH''': k permutation-min signatures per doc, banded
  *    into buckets; candidate pairs = docs sharing a band bucket —
  *    shuffle is O(docs × bands), independent of pair count. Candidates
  *    are then verified with exact Jaccard, so the OUTPUT equals the
  *    exact method's (up to the ~1e-10 LSH miss probability at the 0.8
  *    threshold with 16 bands × 4 rows).
  *  - '''SimHash''': 64-bit weighted-token signature; near-dup = small
  *    Hamming distance, found by joining on one of 4 16-bit chunks
  *    (pigeonhole: distance ≤3 ⇒ some chunk equal).
  */
object Dedup {

  /** 3-word shingles (mirrors the DuckDB slice construction in
    * [[SHINGLES]]). Docs with fewer than n tokens yield an EMPTY array —
    * guarded explicitly because Spark's `sequence(0, -1)` is the
    * DESCENDING range [0, -1] (it would feed `slice(toks, 0, n)`, which
    * throws on a zero start index), while the DuckDB twin's
    * `range(greatest(len-(n-1), 0))` is already empty. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextStats.tokens(text)
    array_distinct(shortDocGuard(toks, n, transform(
      sequence(lit(0), size(toks) - lit(n)),
      i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))))
  }

  /** Empty string-array for docs shorter than the n-gram width (see
    * [[shingles]] — `sequence`'s descending-range footgun). */
  private def shortDocGuard(toks: Column, n: Int, grams: Column): Column =
    when(size(toks) >= lit(n), grams)
      .otherwise(array().cast("array<string>"))

  def SHINGLES(e: String, n: Int = 3): String =
    s"""list_distinct(list_transform(
       |  range(greatest(len(${TextStats.TOKENS(e)}) - ${n - 1}, 0)),
       |  i -> array_to_string(${TextStats.TOKENS(e)}[i+1:i+$n], ' ')))""".stripMargin

  /** [[shingles]] WITHOUT the distinct collapse — every occurrence kept,
    * for frequency-sensitive consumers (n-gram language models count
    * occurrences; dedup shingling wants sets). */
  def ngrams(text: Column, n: Int): Column =
    ngramsFromTokens(TextStats.tokens(text), n)

  /** [[ngrams]] over an ALREADY-TOKENIZED array — for callers that
    * tokenize the corpus once and derive several streams from the
    * cached token arrays (the regex split is the dominant per-row
    * cost; see qLmBigram). Identical values to [[ngrams]] by
    * construction. */
  def ngramsFromTokens(toks: Column, n: Int): Column =
    shortDocGuard(toks, n, transform(
      sequence(lit(0), size(toks) - lit(n)),
      i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))

  def NGRAMS(e: String, n: Int): String =
    s"""list_transform(
       |  range(greatest(len(${TextStats.TOKENS(e)}) - ${n - 1}, 0)),
       |  i -> array_to_string(${TextStats.TOKENS(e)}[i+1:i+$n], ' '))""".stripMargin

  /** doc_id → exploded distinct shingle rows. Repartitioned first: a
    * single-file parquet source otherwise leaves the shingle/hash compute
    * on one partition (one core), regardless of shuffle.partitions. */
  def shingleRows(docs: DataFrame): DataFrame =
    docs.repartition(col("doc_id"))
      .select(col("doc_id"), explode(shingles(col("text"))).as("shingle"))

  /** Exact-Jaccard verification of candidate pairs against the FULL
    * shingle sets: recompute |A∩B| by joining candidates back to the
    * shingle rows (join key includes doc_b, so no hot-shingle skew),
    * then filter on true Jaccard. Shared by [[jaccardPairs]] and
    * [[minhashNearDups]] — both emit exact values for every pair that
    * reaches candidacy. */
  private[text] def verifiedPairs(s: DataFrame, cands: DataFrame,
      threshold: Double): DataFrame = {
    val sizes = s.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val sa = s.select(col("doc_id").as("doc_a"), col("shingle"))
    val sb = s.select(col("doc_id").as("doc_b"), col("shingle"))
    val common = cands.join(sa, "doc_a").join(sb, Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_shingles").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_shingles").as("nb")), "doc_b")
      .withColumn("jaccard", col("common") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= lit(threshold))
      .select(col("doc_a"), col("doc_b"), col("common"),
              round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact Jaccard ≥ threshold pairs, skew-capped.
    *
    * The naive shingle self-join replicates each shingle's posting list
    * quadratically — one boilerplate shingle in 100k docs alone yields
    * 5×10⁹ join rows on ONE key (the skew bomb). Three-phase fix that
    * keeps the output exact AND the hot keys out of the quadratic join:
    *
    *  1. Count common RARE shingles per pair directly in the self-join's
    *     aggregation (map-side combine — pairs are never materialized
    *     as a distinct set), with stop-shingles (df > `stopShingleDf`)
    *     removed, so per-key fan-out is capped at stopShingleDf².
    *  2. Bound the true Jaccard from above: common ≤ common_rare +
    *     min(hot_a, hot_b), J = c/(na+nb−c) is increasing in c. Only
    *     pairs whose BOUND clears the threshold survive — a small set
    *     (near-dups and boilerplate-heavy pairs).
    *  3. Exact-verify the survivors against FULL shingle sets
    *     ([[verifiedPairs]]), so every emitted (common, jaccard) is the
    *     true value.
    *
    * A pair sharing NO rare shingle never reaches the bound — but such
    * a pair can clear the threshold only when BOTH docs are hot-
    * dominated (common ≤ min(ha, hb) and common ≥ t·max(na, nb) force
    * n_hot ≥ t·n_shingles on each side), so phase 4 rescues exactly
    * that pool: identical shingle SETS collapse to one representative
    * (N boilerplate copies — the classic dedup target — cost one doc
    * in the join and emit their J=1 pairs directly, output-size
    * bounded), and only distinct-content representatives self-join.
    * Output therefore provably equals the unfiltered exact self-join
    * (DedupStopShingleSpec proves it on the real corpus and on
    * synthetic all-hot boilerplate corpora). */
  def jaccardPairs(docs: DataFrame, threshold: Double,
      stopShingleDf: Long = 256): DataFrame = {
    // cached: the shingle rows feed six subtrees (df, sizes, rare sizes,
    // the rare self-join's two sides, the verify join) and exchange
    // reuse alone does not cover them (measured 3-4× slower uncached)
    val s = shingleRows(docs).cache()
    val hot = s.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") > lit(stopShingleDf)).select("shingle")
    val rare = s.join(hot, Seq("shingle"), "left_anti")
    val sizes = s.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val rareSizes = rare.groupBy("doc_id").agg(count(lit(1)).as("n_rare"))
    val stats = sizes.join(rareSizes, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        (col("n_shingles") - coalesce(col("n_rare"), lit(0L))).as("n_hot"))
    val commonRare = rare.as("a").join(rare.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common_rare"))
    val plausible = commonRare
      .join(stats.select(col("doc_id").as("doc_a"),
        col("n_shingles").as("na"), col("n_hot").as("ha")), "doc_a")
      .join(stats.select(col("doc_id").as("doc_b"),
        col("n_shingles").as("nb"), col("n_hot").as("hb")), "doc_b")
      .withColumn("max_common", col("common_rare") + least(col("ha"), col("hb")))
      .filter(col("max_common") / (col("na") + col("nb") - col("max_common"))
        >= lit(threshold))
      .cache() // tiny (bound-cleared pairs); both branches below read it
    // when NEITHER doc has hot shingles, common_rare IS the true common
    // (every shared shingle survived the filter) — emit directly; only
    // pairs where hot shingles could contribute go to the verify join
    val exact = plausible.filter(least(col("ha"), col("hb")) === lit(0L))
      .select(col("doc_a"), col("doc_b"), col("common_rare").as("common"),
        round(col("common_rare") / (col("na") + col("nb") - col("common_rare")), 6)
          .as("jaccard"))
    val verified = verifiedPairs(s,
      plausible.filter(least(col("ha"), col("hb")) > lit(0L))
        .select("doc_a", "doc_b"), threshold)

    // phase 4 — rescue the all-hot-overlap pairs the rare self-join
    // cannot see. Attached only when stop-shingles exist at all (a
    // scalar existence probe on the cached shingle frame — the hot df
    // aggregate is computed for phase 1 regardless); without hot
    // shingles the main path IS the exact self-join and the ~10 rescue
    // stages would be planned and shuffled for nothing.
    if (hot.isEmpty) return exact.union(verified)

    // Pool = docs with n_hot ≥ t·n_shingles (proof above:
    // both endpoints of every missed pair are in it). Collapse equal
    // shingle sets before joining: the set fingerprint groups the
    // boilerplate copies, their within-group pairs are J=1 by
    // construction, and only one representative per distinct set
    // enters the (hot-key) shingle self-join.
    val pool = stats
      .filter(col("n_hot") >= lit(threshold) * col("n_shingles"))
      .select("doc_id")
    val ps = s.join(pool, Seq("doc_id"))
    val fps = ps.groupBy("doc_id")
      .agg(md5(concat_ws(" ", array_sort(collect_list(col("shingle"))))).as("fp"),
           count(lit(1)).as("n"))
    val groups = fps.groupBy("fp").agg(min("doc_id").as("rep"))
    val members = fps.join(groups, Seq("fp"))
      .select(col("doc_id"), col("fp"), col("rep"), col("n"))
    val withinPairs = members.as("a").join(members.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
              col("a.n").as("common"), lit(1.0).as("jaccard"))
    val repShingles = ps.join(
      groups.select(col("rep").as("doc_id")), Seq("doc_id"))
    val repPairs = repShingles.as("a").join(repShingles.as("b"),
        col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("ra"), col("b.doc_id").as("rb"))
      .agg(count(lit(1)).as("common"))
      .join(fps.select(col("doc_id").as("ra"), col("n").as("na")), Seq("ra"))
      .join(fps.select(col("doc_id").as("rb"), col("n").as("nb")), Seq("rb"))
      .filter(col("common") / (col("na") + col("nb") - col("common"))
        >= lit(threshold))
    // distinct-set pairs share their representatives' (common, jaccard)
    val crossPairs = repPairs
      .join(members.select(col("rep").as("ra"), col("doc_id").as("da")), Seq("ra"))
      .join(members.select(col("rep").as("rb"), col("doc_id").as("db")), Seq("rb"))
      .select(least(col("da"), col("db")).as("doc_a"),
              greatest(col("da"), col("db")).as("doc_b"),
              col("common"),
              round(col("common") / (col("na") + col("nb") - col("common")), 6)
                .as("jaccard"))
    // a rescued pair can also share a rare shingle (then the verify
    // branch emitted it too, with bit-identical values) — distinct()
    // collapses the overlap; its shuffle is output-sized
    exact.union(verified).union(withinPairs).union(crossPairs).distinct()
  }

  /** MinHash signatures: k universal-hash permutations
    * `(a_i * h + b_i) mod p` over xxhash64 shingle hashes, minima kept in
    * ONE mutable buffer by the custom
    * [[graft.functions.MinHashAgg TypedImperativeAggregate]] (single
    * pass, O(k) merge) instead of k separate min-aggregate columns.
    * Takes pre-exploded shingle rows so callers can share (and cache)
    * one shingle pass between signatures and verification. */
  def minhashSignatures(shingleRows: DataFrame, k: Int = 64): DataFrame = {
    import graft.functions.MinHashAgg
    shingleRows
      .withColumn("h", pmod(xxhash64(col("shingle")), lit(MinHashAgg.P)))
      .groupBy("doc_id")
      .agg(MinHashAgg.minhash_sig(col("h"), k).as("sig"))
  }

  /** LSH candidate pairs: band the signature array (bands × rowsPerBand
    * = k), bucket-join docs sharing any band hash. */
  def lshCandidates(sigs: DataFrame, bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val rows = (0 until rowsPerBand).map(r => col("sig").getItem(b * rowsPerBand + r))
      struct(lit(b).as("band"), xxhash64(rows: _*).as("bh"))
    }
    val buckets = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.bh"))
    buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** MinHash-LSH near-dup detection, exact-verified: candidates from
    * [[lshCandidates]] are checked with true Jaccard — output matches
    * [[jaccardPairs]] while shuffling only O(docs × bands) rows. */
  def minhashNearDups(docs: DataFrame, threshold: Double): DataFrame = {
    val s = shingleRows(docs).cache()
    verifiedPairs(s, lshCandidates(minhashSignatures(s)), threshold)
  }

  /** Cross-engine 64-bit token hash: the first 8 bytes of md5(token),
    * LITTLE-endian (md5 is bit-standard everywhere; this byte order is
    * what DuckDB's `md5_number_upper` returns, so an oracle can compute
    * the identical value). Assembled from hex pairs with codegen'd
    * conv/shift builtins; the top byte may set the sign bit — only the
    * BIT PATTERN is used downstream, which signedness doesn't affect. */
  def md5Hash64(t: Column): Column = md5Half(t, 0)

  /** The OTHER md5 half — bytes 8–15, same little-endian assembly
    * (DuckDB's `md5_number_lower`). Paired with [[md5Hash64]] this
    * gives the full 128-bit digest as two longs: collision-free at any
    * realistic corpus scale, still a narrow fixed-width shuffle key. */
  def md5Hash64Lo(t: Column): Column = md5Half(t, 8)

  private def md5Half(t: Column, byteOff: Int): Column = {
    val hex = md5(t)
    (0 until 8).map { i =>
      shiftleft(conv(substring(hex, 2 * (i + byteOff) + 1, 2), 16, 10)
        .cast("long"), 8 * i)
    }.reduce(_ bitwiseOR _)
  }

  /** DuckDB twin of [[md5Hash64]] (UBIGINT; same 64-bit pattern). */
  def MD5_HASH64(e: String): String = s"md5_number_upper($e)"

  /** DuckDB twin of [[md5Hash64Lo]]. */
  def MD5_HASH64_LO(e: String): String = s"md5_number_lower($e)"

  /** 64-bit SimHash signatures: per token-hash bit, sum ±1 across a
    * doc's tokens; sign → signature bit.
    *
    * Shape: explode tokens → 64-bit hash → 64 conditional-sum
    * aggregates → recombine bits. Everything is a codegen'd built-in
    * (the earlier array-lambda formulation ran interpreted, 64 passes
    * per doc); the single groupBy(doc_id) shuffle carries 64 longs per
    * doc and parallelizes by doc at any scale.
    *
    * `crossEngineHash = true` swaps xxhash64 (fastest, engine-specific)
    * for the md5-derived hash so an independent engine can recompute
    * the signatures bit-for-bit — the oracle path; production keeps
    * xxhash64. */
  def simhashSignatures(docs: DataFrame,
      crossEngineHash: Boolean = false): DataFrame = {
    val raw = docs.repartition(col("doc_id"))
      .select(col("doc_id"),
        explode(TextStats.tokens(col("text"))).as("t"))
    // xxhash64 is one codegen'd call — hash inline. The md5 oracle hash
    // costs md5 + 8 conv/shift per value, so hash the DISTINCT token
    // dictionary once and broadcast it back onto the occurrences: the
    // vocabulary is orders of magnitude smaller than the token stream
    // (Heaps' law — still broadcastable at corpus scale).
    val tok =
      if (!crossEngineHash) raw.withColumn("h", xxhash64(col("t")))
      else raw.join(
        broadcast(raw.select("t").distinct()
          .withColumn("h", md5Hash64(col("t")))), "t")
    val sums = (0 until 64).map { j =>
      sum(when(col("h").bitwiseAND(lit(1L << j)) =!= lit(0L), lit(1L))
        .otherwise(lit(-1L))).as(s"b$j")
    }
    val sig = (0 until 64)
      .map(j => when(col(s"b$j") > lit(0L), lit(1L << j)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    tok.groupBy("doc_id").agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), sig.as("sig"))
  }

  /** Hamming-≤ maxDist SimHash pairs via 16-bit chunk pigeonhole join.
    * The chunk join is LOSSLESS only for maxDist ≤ 3 (4 chunks); above
    * that it is the declared candidate filter — a pair counts iff some
    * 16-bit chunk matches exactly AND the full Hamming distance is
    * within maxDist. The oracle mirrors both conditions. */
  def simhashNearDups(docs: DataFrame, maxDist: Int = 6,
      crossEngineHash: Boolean = false): DataFrame = {
    val sigs = simhashSignatures(docs, crossEngineHash)
    val chunks = (0 until 4).map { c =>
      struct(lit(c).as("chunk"),
        col("sig").bitwiseAND(lit(0xFFFFL << (c * 16))).as("piece"))
    }
    val keyed = sigs.select(col("doc_id"), col("sig"),
      explode(array(chunks: _*)).as("ck"))
      .select(col("doc_id"), col("sig"), col("ck.chunk"), col("ck.piece"))
    val popcount = (x: Column) => bit_count(x)
    keyed.as("a").join(keyed.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.piece") === col("b.piece") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
              popcount(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= lit(maxDist))
  }

  /** Hamming-≤ maxDist pairs over a split 64-bit signature
    * (sig_hi = bits 32–63, sig_lo = bits 0–31, both non-negative) —
    * the pairing engine behind perceptual-hash image dedup. Same
    * 16-bit chunk pigeonhole as [[simhashNearDups]]: a Hamming
    * distance ≤ 3 spread across 4 disjoint chunks must leave one chunk
    * untouched, so for maxDist ≤ 3 the equi-join candidate set is
    * PROVABLY COMPLETE — the output equals the exact all-pairs answer
    * without any quadratic join. Input columns (media_id, sig_hi,
    * sig_lo); output (media_a, media_b, hamming). */
  def hammingPairs64(sigs: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist <= 3,
      s"4-chunk pigeonhole is only complete for maxDist <= 3 (got $maxDist); " +
      "derive more chunks (maxDist+1) before raising the radius")
    val pieces = Seq(
      col("sig_lo").bitwiseAND(lit(0xFFFFL)),
      shiftright(col("sig_lo"), 16).bitwiseAND(lit(0xFFFFL)),
      col("sig_hi").bitwiseAND(lit(0xFFFFL)),
      shiftright(col("sig_hi"), 16).bitwiseAND(lit(0xFFFFL)))
    val chunks = pieces.zipWithIndex.map { case (p, c) =>
      struct(lit(c).as("chunk"), p.as("piece"))
    }
    val keyed = sigs
      .select(col("media_id"), col("sig_hi"), col("sig_lo"),
        explode(array(chunks: _*)).as("ck"))
      .select(col("media_id"), col("sig_hi"), col("sig_lo"),
        col("ck.chunk"), col("ck.piece"))
    keyed.as("a").join(keyed.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.piece") === col("b.piece") &&
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        (bit_count(col("a.sig_hi").bitwiseXOR(col("b.sig_hi"))) +
          bit_count(col("a.sig_lo").bitwiseXOR(col("b.sig_lo"))))
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= lit(maxDist))
  }

  /** Truncation-prefix pairs: every (a, b) where a's token sequence is
    * a strict PREFIX of b's, over docs with ≥ 8 tokens (shorter docs
    * are out of scope by declared semantics). Output: (doc_a, doc_b,
    * n_a, n_b), exactly equal to the naive pk8 self-join — but
    * HOT-PREFIX CAPPED, because the candidate key (md5 of the first 8
    * tokens) is precisely the boilerplate-opening statistic: license
    * headers and templated intros put millions of docs on one key and
    * make the naive Σ bucket² join quadratic (the same skew bomb
    * [[jaccardPairs]] solves with stop-shingles). Three branches, all
    * bucketed equi-joins:
    *
    *  1. COLD buckets (prefix df ≤ `hotPrefixDf`): join within the
    *     8-token bucket, exact slice-equality residual. Candidate
    *     volume ≤ cap · n.
    *  2. HOT buckets, both docs ≥ 16 tokens: re-key on the md5 of the
    *     first 16 tokens and join within the sub-bucket (legal: a
    *     prefix pair with n_a ≥ 16 shares its first 16 tokens by
    *     definition). One recursion level — a 16-token-identical
    *     opening with df > cap keeps quadratic candidates; the ladder
    *     generalizes by iterating (32, 64, …) if a real corpus ever
    *     needs it.
    *  3. HOT buckets, a shorter than 16 tokens: OUTPUT-BOUNDED rescue.
    *     The b side emits md5 keys of its j-token prefixes for
    *     j ∈ [8, min(15, n_b−1)]; the short a side keys on its FULL
    *     token content (one key). Key equality already implies the
    *     prefix match (the slice residual stays as md5-collision
    *     armor), so join volume ≈ true pair count — never a bucket².
    *
    * Branches are disjoint (cold/hot by bucket, n_a ≥ 16 vs < 16
    * within hot), so the union needs no dedup. `PrefixDedupSkewSpec`
    * proves output equality with the uncapped join on a synthetic
    * common-opening corpus that forces all three branches. */
  def prefixPairs(tokenized: DataFrame, hotPrefixDf: Long = 256): DataFrame = {
    // cached: the keyed frame feeds the df count plus both sides of
    // all three branch joins (the jaccardPairs shingle-rows pattern —
    // uncached, tokenization + md5 re-run per subtree, measured ~4×
    // slower at sf0.1)
    val wn = tokenized
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n"))
      .filter(col("n") >= 8)
      .withColumn("pk", md5(array_join(expr("slice(toks, 1, 8)"), " ")
        .cast("binary")))
      .cache()

    def verified(a: DataFrame, b: DataFrame, key: String) =
      a.as("a").join(b.as("b"),
          col(s"a.$key") === col(s"b.$key") && col("a.n") < col("b.n") &&
            expr("slice(b.toks, 1, a.n)") === col("a.toks"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.n").as("n_a"), col("b.n").as("n_b"))

    val dfc = wn.groupBy("pk").agg(count(lit(1)).as("df"))
    // no hot prefixes (the common case on curated corpora): the cold
    // join IS the uncapped join — skip the flag join and both hot
    // branches (the jaccardPairs existence-probe pattern; the probe is
    // one aggregate over the cached keyed frame)
    if (dfc.filter(col("df") > lit(hotPrefixDf)).isEmpty)
      return verified(wn, wn, "pk")

    // dfc is ~one row per distinct prefix — NOT broadcast-hinted (it
    // scales with the corpus; AQE promotes it when it happens to fit)
    val flagged = wn.join(dfc, "pk")
    val cold = flagged.filter(col("df") <= lit(hotPrefixDf))
      .select("pk", "doc_id", "toks", "n")
    val hot = flagged.filter(col("df") > lit(hotPrefixDf))
      .select("doc_id", "toks", "n")

    val coldPairs = verified(cold, cold, "pk")

    val hot16 = hot.filter(col("n") >= 16)
      .withColumn("pk16", md5(array_join(expr("slice(toks, 1, 16)"), " ")
        .cast("binary")))
    val subPairs = verified(hot16, hot16, "pk16")

    // output-bounded short rescue: a = hot docs with 8 <= n < 16 keyed
    // by full content; b = hot docs emitting one key per prefix length
    // j in [8, min(15, n-1)] (n >= 9 guard keeps sequence() ascending)
    val shortA = hot.filter(col("n") < 16)
      .withColumn("fk", md5(array_join(col("toks"), " ").cast("binary")))
    val longB = hot.filter(col("n") >= 9)
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(8), least(lit(15), col("n") - 1))).as("j"))
      .withColumn("fk", md5(array_join(expr("slice(toks, 1, j)"), " ")
        .cast("binary")))
    val shortPairs = verified(shortA, longB, "fk")

    coldPairs.unionAll(subPairs).unionAll(shortPairs)
  }

  /** Exact dedup groups: canonical fingerprint → group size + keeper
    * (min doc_id). */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(TextStats.fingerprint(col("text")).as("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))

  /** Connected components over a near-dup pair graph — the step that
    * turns pairwise matches into DEDUP DECISIONS (one keeper per
    * transitive cluster; A≈B and B≈C must collapse to one document
    * even when A and C were never compared).
    *
    * Alternating large-star / small-star (Kiveris et al., "Connected
    * Components in MapReduce and Beyond"): each round rewires every
    * node's neighbors toward its local minimum —
    *   large-star: ∀u, neighbors v > u attach to m = min(N(u) ∪ {u});
    *   small-star: ∀u, neighbors v ≤ u (and u) attach to that m —
    * converging in O(log n) rounds REGARDLESS of graph diameter (a
    * 10k-link near-dup chain, common in scraped boilerplate corpora,
    * takes ~log rounds where plain min-label propagation takes 10k).
    * At the fixpoint the edges form a star per component rooted at its
    * minimum doc_id, which is exactly the min-label result. Each round
    * is two groupBy-join shuffles over the (shrinking) edge list.
    *
    * Lineage is truncated per round: reliable `checkpoint()` when the
    * session has a checkpoint dir (survives executor loss on a real
    * cluster), `localCheckpoint()` otherwise.
    *
    * Input: (doc_a, doc_b) pair rows. Output: (doc_id, cluster_id)
    * with cluster_id = min doc_id of the component; only docs that
    * appear in some pair (singletons are not near-dups). */
  def connectedComponents(pairs: DataFrame): DataFrame =
    connectedComponentsWithRounds(pairs)._1

  /** Per-round lineage truncation for driver-side fixpoint loops
    * (connected components, PageRank): reliable `checkpoint()` when
    * the session has a checkpoint dir (survives executor loss on a
    * real cluster), `localCheckpoint()` otherwise. Without it every
    * round re-plans the whole chain so far — planner blow-up once
    * iterations or graph size grow. */
  private[graft] def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()

  /** [[connectedComponents]] plus the round count, for round-bound
    * tests (`ClusterSpec` pins O(log n) on a worst-case chain). */
  private[graft] def connectedComponentsWithRounds(
      pairs: DataFrame): (DataFrame, Int) = {
    // undirected edge set, canonical (big, small), self-loops dropped
    var edges = truncate(pairs
      .select(greatest(col("doc_a"), col("doc_b")).as("u"),
              least(col("doc_a"), col("doc_b")).as("v"))
      .filter(col("u") =!= col("v")).distinct())
    val nodes = edges.select(col("u").as("id"))
      .union(edges.select(col("v").as("id"))).distinct()

    // large-star: symmetric neighbor view; m_u = min(N(u) ∪ {u});
    // strictly-larger neighbors re-attach to m_u
    def largeStar(e: DataFrame): DataFrame = {
      val nbr = e.select(col("u").as("src"), col("v").as("dst"))
        .union(e.select(col("v").as("src"), col("u").as("dst")))
      val m = nbr.groupBy("src")
        .agg(least(min(col("dst")), first(col("src"))).as("m"))
      nbr.filter(col("dst") > col("src"))
        .join(m, "src")
        .select(col("dst").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
    }
    // small-star: only the larger-to-smaller direction; everything in
    // N_small(u) ∪ {u} attaches to m_u = min(N_small(u))
    def smallStar(e: DataFrame): DataFrame = {
      val m = e.groupBy("u").agg(min(col("v")).as("m"))
      val rewired = e.join(m, "u")
        .select(col("v").as("u"), col("m").as("v"))
      val self = m.select(col("u"), col("m").as("v"))
      rewired.union(self)
        .filter(col("u") =!= col("v")).distinct()
    }

    // convergence by edge-set signature (count + exact sums + hash sum):
    // one cheap aggregate job per round on the just-checkpointed frame
    // instead of two exceptAll shuffle-joins. Equal signatures on
    // UNEQUAL sets would need an xxhash64 multiset collision at equal
    // count and equal exact endpoint sums — vanishingly unlikely, and
    // one extra (idempotent) round is the only consequence of a miss in
    // the other direction.
    def signature(e: DataFrame): (Long, Long, Long) = {
      val r = e.agg(
        count(lit(1)),
        coalesce(sum(xxhash64(col("u"), col("v"))), lit(0L)),
        coalesce(sum(col("u") + col("v")), lit(0L))).first()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    var rounds = 0
    var sig = signature(edges)
    var converged = sig._1 == 0L
    while (!converged) {
      val next = truncate(smallStar(largeStar(edges)))
      rounds += 1
      val nextSig = signature(next)
      converged = nextSig == sig
      sig = nextSig
      edges = next
    }
    // fixpoint edges are (member, root) stars; roots label themselves
    val labels = nodes.join(edges, nodes("id") === edges("u"), "left")
      .select(col("id").as("doc_id"),
              coalesce(col("v"), col("id")).as("cluster_id"))
    (labels, rounds)
  }

  /** Near-dup clusters at a Jaccard threshold: components over
    * [[jaccardPairs]] plus per-cluster size — the frame a keeper/drop
    * pass consumes. */
  def nearDupClusters(docs: DataFrame, threshold: Double): DataFrame = {
    val cc = connectedComponents(jaccardPairs(docs, threshold))
    val sizes = cc.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
  }

  /** Incremental-ingestion gate: which BATCH documents survive against
    * an EXISTING corpus — the daily-ingest shape (dedup the delta
    * against the lake, never re-cluster the lake itself). Per batch
    * doc: `exact_new` (fingerprint unseen in the corpus), `neardup_new`
    * (no cross-side Jaccard pair ≥ threshold), `accepted` = both.
    *
    * The near-dup check first PRUNES the lake to candidate docs that
    * share ≥ 1 shingle with the batch — a map-side semi-join against
    * the broadcast batch shingle set (a cross pair at any positive
    * Jaccard requires a shared shingle, so pruning is exact) — then
    * runs [[jaccardPairs]] over batch ∪ candidates and keeps the pairs
    * crossing the split, inheriting the hardened bound-then-verify
    * scale shape (stop-shingle cap, upper-bound filter, all-hot
    * rescue). The lake is never re-paired with itself beyond the
    * batch-adjacent candidates; worst case (every lake doc shares a
    * stop-shingle with the batch) degrades to the full union, where
    * the stop-shingle cap takes over. Batch-INTERNAL dups are out of
    * scope here — that decision is [[exactGroups]]/[[nearDupClusters]]
    * on the accepted delta. */
  def incrementalFlags(batch: DataFrame, corpus: DataFrame,
      threshold: Double): DataFrame = {
    val corpusFps = corpus
      .select(TextStats.fingerprint(col("text")).as("fp")).distinct()
    val exactNew = batch
      .select(col("doc_id"), TextStats.fingerprint(col("text")).as("fp"))
      .join(corpusFps.withColumn("fp_hit", lit(1)), Seq("fp"), "left")
      .select(col("doc_id"), col("fp_hit").isNull.as("exact_new"))
    val batchShingles = shingleRows(batch).select("shingle").distinct()
    val candidates = shingleRows(corpus)
      .join(broadcast(batchShingles), Seq("shingle"), "left_semi")
      .select("doc_id").distinct()
    val pairs = jaccardPairs(
      batch.select(col("doc_id"), col("text"))
        .unionByName(corpus.join(candidates, "doc_id")
          .select(col("doc_id"), col("text"))), threshold)
    val bIds = batch.select(col("doc_id"))
    val tagged = pairs
      .join(bIds.select(col("doc_id").as("doc_a"), lit(true).as("a_b")),
        Seq("doc_a"), "left")
      .join(bIds.select(col("doc_id").as("doc_b"), lit(true).as("b_b")),
        Seq("doc_b"), "left")
      .select(col("doc_a"), col("doc_b"),
        coalesce(col("a_b"), lit(false)).as("a_in_batch"),
        coalesce(col("b_b"), lit(false)).as("b_in_batch"))
    val ndRejected = tagged
      .filter(col("a_in_batch") =!= col("b_in_batch"))
      .select(when(col("a_in_batch"), col("doc_a")).otherwise(col("doc_b"))
        .as("doc_id"))
      .distinct()
    batch.select(col("doc_id"), col("source"))
      .join(exactNew, "doc_id")
      .join(ndRejected.withColumn("nd_hit", lit(1)), Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        col("exact_new").cast("int").as("exact_new"),
        col("nd_hit").isNull.cast("int").as("neardup_new"),
        (col("exact_new") && col("nd_hit").isNull).cast("int").as("accepted"))
  }

  /** Exact duplicated-SUBSTRING coverage (the Lee et al. "Deduplicating
    * Training Data Makes Language Models Better" signal, k-gram form):
    * a token position is duplicated iff it sits inside some k-token
    * window whose exact text occurs MORE THAN ONCE in the corpus
    * (any document, any position — intra-doc repeats count). Finding
    * every duplicated window of length >= k needs only stride-1
    * k-grams: any longer repeat contains a repeated k-gram, so the
    * merged k-gram spans are exactly the positions inside some
    * duplicated substring of length >= k. Per doc the output is the
    * MERGED span length — the fraction of the doc a substring-level
    * deduper would cut, which is the decision signal exact/Jaccard
    * doc-level dedup cannot see (a half-copied doc is "new" to them).
    *
    * Shape at 100 TB: the k-gram explode is linear (one row per token
    * position); occurrence counts are one groupBy on the UNIFORM
    * 64-bit md5 gram key (no hot keys — the key carries the whole
    * k-token window, so even boilerplate openings split across their
    * following context... identical windows are exactly what we are
    * counting, and their count rows collapse in the partial agg);
    * marking rides the same key back as one equi-join; the interval
    * merge is a per-doc window (parallel by doc). A suffix array gives
    * the same answer with better constants on one machine — the
    * k-gram/groupBy form is the one that distributes.
    *
    * Gram keys are the FULL 128-bit md5 as two longs
    * ([[md5Hash64]]/[[md5Hash64Lo]] — DuckDB's md5_number_upper/lower,
    * so both engines hash identically): at 100 TB gram cardinality
    * passes the 64-bit birthday bound (~2^32) where half-width keys
    * would overcount routinely; 128 bits keeps collisions negligible
    * at any realistic scale while the shuffle key stays a fixed 16
    * bytes (`SpanKeyWidthSpec` demonstrates the narrow-key overcount
    * and the wide-key separation on an engineered collision). */
  def spanCoverage(docsDf: DataFrame, k: Int = 8): DataFrame = {
    val toks = TextStats.tokens(col("text"))
    val base = docsDf
      .select(col("doc_id"), toks.as("toks"))
      .withColumn("n_tokens", size(col("toks")))
    val grams = base
      .select(col("doc_id"), posexplode(shortDocGuard(col("toks"), k,
        transform(sequence(lit(0), col("n_tokens") - lit(k)),
          i => concat_ws(" ", slice(col("toks"), i + lit(1), lit(k)))))))
      .select(col("doc_id"), col("pos").as("i"),
        md5Hash64(col("col")).as("h1"), md5Hash64Lo(col("col")).as("h2"))
    val dupKeys = grams.groupBy("h1", "h2").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
    // window: prior-row running max of span ends; each row adds only
    // its uncovered tail, so the sum is the merged interval length
    // (span ends are i+k-1 with i strictly increasing, so the previous
    // max never reaches past the current end)
    val w = Window.partitionBy("doc_id").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, -1)
    val covered = grams.join(dupKeys, Seq("h1", "h2"))
      .withColumn("pme", coalesce(max(col("i") + lit(k - 1)).over(w),
        lit(-1)))
      .withColumn("add",
        col("i") + lit(k - 1) - greatest(col("pme"), col("i") - lit(1)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_grams"),
        sum(col("add")).cast("long").as("covered_tokens"))
    base.select(col("doc_id"), col("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        when(col("n_tokens") > 0,
          round(coalesce(col("covered_tokens"), lit(0L)) /
            col("n_tokens"), 6)).otherwise(lit(0.0)).as("coverage"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of [[spanCoverage]] on the documents table. */
  def SPAN_COVERAGE(k: Int = 8): String = {
    val T = TextStats.TOKENS("text")
    s"""WITH t AS (
       |  SELECT doc_id, $T AS toks, len($T) AS n_tokens FROM documents),
       |g AS (
       |  SELECT doc_id, n_tokens, CAST(u.i AS INTEGER) AS i,
       |         md5_number_upper(array_to_string(toks[u.i+1:u.i+$k], ' ')) AS h1,
       |         md5_number_lower(array_to_string(toks[u.i+1:u.i+$k], ' ')) AS h2
       |  FROM t, unnest(range(greatest(n_tokens - ${k - 1}, 0))) AS u(i)),
       |dup AS (SELECT h1, h2 FROM g GROUP BY h1, h2 HAVING count(*) > 1),
       |d AS (SELECT g.doc_id, g.i FROM g JOIN dup USING (h1, h2)),
       |m AS (
       |  SELECT doc_id, i,
       |         coalesce(max(i + ${k - 1}) OVER (
       |           PARTITION BY doc_id ORDER BY i
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |           -1) AS pme
       |  FROM d),
       |c AS (
       |  SELECT doc_id, count(*) AS n_dup_grams,
       |         CAST(sum(i + ${k - 1} - greatest(pme, i - 1)) AS BIGINT)
       |           AS covered_tokens
       |  FROM m GROUP BY doc_id)
       |SELECT t.doc_id, CAST(t.n_tokens AS INTEGER) AS n_tokens,
       |       CAST(coalesce(c.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
       |       coalesce(c.covered_tokens, 0) AS covered_tokens,
       |       CASE WHEN t.n_tokens > 0
       |            THEN round(coalesce(c.covered_tokens, 0) /
       |                       t.n_tokens, 6)
       |            ELSE 0.0 END AS coverage
       |FROM t LEFT JOIN c USING (doc_id) ORDER BY doc_id""".stripMargin
  }
}
