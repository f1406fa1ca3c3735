package graft

import org.apache.spark.sql.functions._

import graft.text.{LangId, TextStats}

/** Hashed-n-gram NB language ID ([[LangId]]).
  *
  * Pins the three claims the registry row rests on:
  *  1. the model beats the stopword heuristic on the held-out split
  *     (the reason it exists — the r7 verdict's top gap);
  *  2. scores are LAYOUT-INDEPENDENT: the integer-grid scoring makes
  *     predictions identical at 4 vs 32 partitions (what makes the
  *     result stable across cluster sizes / AQE replans at 100 TB);
  *  3. the augmentation is deterministic and label-faithful (every
  *     drawn word comes from the label's vocabulary).
  */
class LangIdSpec extends SparkSuite {

  private lazy val docs = graft.io.Tables.load(spark, sf("sf0.001"), "documents")

  test("NB model dominates the stopword heuristic on the held-out split") {
    val aug = LangId.augmented(docs)
    val scored = aug.join(LangId.predictions(aug), "doc_id")
      .withColumn("lang_heur", TextStats.predictedLang(col("aug")))
      .filter(!col("is_train"))
      .agg(count(lit(1)).as("n"),
        sum((col("lang_model") === col("lang")).cast("long")).as("m_ok"),
        sum((col("lang_heur") === col("lang")).cast("long")).as("h_ok"))
      .head()
    val (n, mOk, hOk) = (scored.getLong(0), scored.getLong(1), scored.getLong(2))
    assert(n > 100, s"held-out split too small: $n")
    assert(mOk.toDouble / n >= 0.95, s"model accuracy ${mOk.toDouble / n}")
    assert(mOk > hOk, s"model $mOk must beat heuristic $hOk")
  }

  test("predictions are identical at 4 vs 32 partitions") {
    val p4 = LangId.predictions(LangId.augmented(docs.repartition(4)))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    val p32 = LangId.predictions(LangId.augmented(docs.repartition(32)))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(p4.sameElements(p32))
  }

  test("2-conv bucket equals the md5-64 low bits (the oracle contract)") {
    // LangId's fast bucket uses only hex chars 1-4 (little-endian byte
    // 0 is LEAST significant); it must bit-match Dedup.md5Hash64 & 2047
    // on arbitrary grams, because DuckDB's md5_number_upper % 2048 is
    // defined against the full 64-bit assembly
    import graft.text.Dedup
    val hex = md5(col("g"))
    val fast = (conv(substring(hex, 1, 2), 16, 10).cast("long") bitwiseOR
      shiftleft(conv(substring(hex, 3, 2), 16, 10).cast("long"), 8))
      .bitwiseAND(lit(2047L))
    val grams = LangId.augmented(docs)
      .select(explode(split(lower(col("aug")), "")).as("c"))
      .select(concat(col("c"), lit("¿"), col("c")).as("g"))
    val diff = grams.filter(
      fast =!= Dedup.md5Hash64(col("g")).bitwiseAND(lit(2047L))).count()
    assert(diff == 0)
  }

  test("augmentation draws only from the label's vocabulary, deterministically") {
    val aug1 = LangId.augmented(docs).orderBy("doc_id")
      .select("aug").collect().map(_.getString(0))
    val aug2 = LangId.augmented(docs).orderBy("doc_id")
      .select("aug").collect().map(_.getString(0))
    assert(aug1.sameElements(aug2), "augmentation must be deterministic")
    val rows = LangId.augmented(docs)
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(col("lang"), expr("substring(aug, length(text) + 2)").as("tail"))
      .collect()
    rows.foreach { r =>
      val lang = r.getString(0)
      val words = r.getString(1).split(" ").filter(_.nonEmpty)
      assert(words.length == LangId.draws)
      words.foreach(w => assert(LangId.vocab(lang).contains(w),
        s"word '$w' not in vocab($lang)"))
    }
  }
}
