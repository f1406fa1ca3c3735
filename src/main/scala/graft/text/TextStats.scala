package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: tokenization,
  * quality scoring, language ID (stopword/n-gram heuristic), document
  * fingerprinting. All are narrow per-row expressions (no shuffle, fully
  * codegen'd built-ins) — they scale linearly and pipeline inside the scan
  * stage at 100 TB.
  *
  * Language-ID scoring is generated from [[stopwords]] for BOTH engines
  * (Spark Columns here, DuckDB SQL via [[scoreSql]]) so the oracle is the
  * same heuristic by construction.
  */
object TextStats {

  /** Deterministic tiebreak order = list order (first wins on equal
    * scores). */
  val langs: Seq[String] = Seq("en", "de", "es", "fr", "zh")

  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "im", "ein"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr" -> Seq("le", "la", "de", "et", "est", "une", "dans", "pour", "que", "il"),
    "zh" -> Seq("de5", "shi4", "bu4", "le5", "ren2", "wo3", "zai4", "you3", "ta1", "zhe4"))

  /** Whitespace tokens, empties dropped (mirrors DuckDB
    * `list_filter(string_split(text,' '), t -> t <> '')`). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= lit(""))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish regex token count: letter runs, digit runs, single
    * punctuation — the classic pre-tokenizer shape. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  def avgWordLen(text: Column): Column = {
    val t = tokens(text)
    aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(t)
  }

  def punctRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0))).cast("double") /
      length(text)

  def stopwordRatio(text: Column): Column = {
    val all = stopwords.values.flatten.toSeq.distinct
    size(filter(tokens(text), t => t.isInCollection(all))).cast("double") /
      size(tokens(text))
  }

  /** Per-language stopword hit count. */
  def langScore(text: Column, lang: String): Column =
    size(filter(tokens(text), t => t.isInCollection(stopwords(lang))))

  /** argmax over [[langScore]]s, ties broken by [[langs]] order. */
  def predictedLang(text: Column): Column = {
    val scores = langs.map(l => l -> langScore(text, l))
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), els) =>
      when(s === best && s > lit(0), lit(l)).otherwise(els)
    }
  }

  /** Simple quality score in [0,1]: favors mid-length docs with low
    * punctuation and some stopwords (the standard cheap heuristics). */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / lit(100.0), lit(1.0))
    val punct = coalesce(punctRatio(text), lit(0.0))
    val stop = coalesce(stopwordRatio(text), lit(0.0))
    least(greatest(lenScore * (lit(1.0) - punct) * (lit(0.5) + stop),
      lit(0.0)), lit(1.0))
  }

  /** Canonical-form fingerprint: md5 of lowercased, whitespace-collapsed
    * text. md5 is bit-standard across engines → oracle-comparable. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")).cast("binary"))

  // ---- DuckDB twins (generated from the same lists) ----

  def TOKENS(e: String): String =
    s"list_filter(string_split($e, ' '), t -> t <> '')"

  private def inList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")

  def scoreSql(e: String, lang: String): String =
    s"CAST(len(list_filter(${TOKENS(e)}, t -> t IN (${inList(stopwords(lang))}))) AS INTEGER)"

  def predictedSql(e: String): String = {
    val best = langs.map(l => scoreSql(e, l)).mkString("greatest(", ", ", ")")
    langs.reverse.foldLeft("'und'") { (els, l) =>
      s"CASE WHEN ${scoreSql(e, l)} = $best AND ${scoreSql(e, l)} > 0 THEN '$l' ELSE $els END"
    }
  }

  def FINGERPRINT(e: String): String =
    s"md5(trim(regexp_replace(lower($e), '\\s+', ' ', 'g')))"

  // ---- HTML -> text extraction ----

  /** Literal entity decodes, applied AFTER tag stripping (so a decoded
    * `&lt;b&gt;` stays visible text instead of being re-stripped) and
    * with `&amp;` LAST (so `&amp;lt;` decodes to the literal `&lt;`,
    * not to `<`). Shared by both engines. */
  val htmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** (pattern, flags-prefix) regex strip cascade — comments, script
    * blocks, style blocks, then every remaining tag to whitespace.
    * RE2-compatible (non-greedy dotall, no backrefs) so the DuckDB
    * twin runs the identical patterns. Declared semantics, mirrored
    * exactly by [[EXTRACT_HTML]]:
    *  - an UNCLOSED `<script>`/`<style>` block falls through to the
    *    tag stripper (its body surfaces as text — deterministic, and
    *    honest about the input being broken);
    *  - a literal `>` inside a quoted attribute value ends the tag at
    *    that `>` (regex tag model, not a parser). */
  val htmlStripPatterns: Seq[String] = Seq(
    "(?s)<!--.*?-->",
    "(?is)<script\\b[^>]*>.*?</script\\s*>",
    "(?is)<style\\b[^>]*>.*?</style\\s*>",
    "(?s)<[^>]*>")

  /** HTML → visible text: strip comments/script/style, tags to
    * whitespace, decode the common entities, collapse whitespace, trim
    * — the front of the web-corpus funnel (every text operator
    * downstream assumes extracted text). A pure row-local chain of
    * codegen'd built-ins: no shuffle, pipelines inside the scan at any
    * scale. */
  def extractHtml(html: Column): Column = {
    val stripped = htmlStripPatterns.foldLeft(html) { (c, pat) =>
      regexp_replace(c, pat, " ")
    }
    val decoded = htmlEntities.foldLeft(stripped) { case (c, (e, r)) =>
      replace(c, lit(e), lit(r))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** DuckDB twin of [[extractHtml]] — the same cascade, generated from
    * the same pattern/entity lists. */
  def EXTRACT_HTML(e: String): String = {
    // DuckDB single-quoted literals keep backslashes literal, so the
    // Scala pattern strings interpolate verbatim; dotall/case flags are
    // inline (?s)/(?is), identical for java.util.regex and RE2
    val stripped = htmlStripPatterns.foldLeft(e) { (acc, pat) =>
      s"regexp_replace($acc, '$pat', ' ', 'g')"
    }
    val decoded = htmlEntities.foldLeft(stripped) { case (acc, (ent, r)) =>
      val rr = if (r == "'") "''" else r
      s"replace($acc, '$ent', '$rr')"
    }
    s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
  }

  // ---- PII scrubbing ----

  /** Conservative PII patterns (kept RE2-compatible so the same text
    * works in any engine): emails, URLs, long digit runs (phone/ID
    * shaped). Order matters — URLs before digit runs. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "https?://[^\\s]+" -> "<URL>",
    "[0-9][0-9()+. -]{6,}[0-9]" -> "<NUMBER>")

  /** Replace every PII match with its typed placeholder — the redaction
    * pass a training corpus runs before anything else sees the text. */
  def scrub(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Count of PII matches in the text (pre-redaction audit metric). */
  def piiCount(text: Column): Column =
    piiPatterns.map { case (pat, _) =>
      size(regexp_extract_all(text, lit(pat), lit(0)))
    }.reduce(_ + _)

  /** Overlapping token-window chunking — the retrieval/embedding prep
    * step (size-token windows every stride tokens; the final window
    * may be short). One row per (doc, chunk): chunk index, its token
    * count, and the md5 of the space-joined chunk text (the id an
    * embedding or retrieval index would key on). Pure row-local
    * explode — embarrassingly parallel, no shuffle beyond output
    * ordering. */
  def chunkDocs(docs: org.apache.spark.sql.DataFrame, size: Int,
      stride: Int): org.apache.spark.sql.DataFrame = {
    require(size > 0 && stride > 0, "size and stride must be positive")
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0),
          greatest(org.apache.spark.sql.functions.size(col("toks")) - 1, lit(0)),
          lit(stride))).as("start"))
      .select(col("doc_id"),
        (col("start") / lit(stride)).cast("int").as("chunk_idx"),
        org.apache.spark.sql.functions.size(
          slice(col("toks"), col("start") + 1, lit(size))).as("n_chunk_tokens"),
        md5(concat_ws(" ", slice(col("toks"), col("start") + 1, lit(size)))
          .cast("binary")).as("chunk_md5"))
  }
}
