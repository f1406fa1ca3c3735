package graft

import org.apache.spark.sql.functions._

import graft.functions.NormalizeText.text_normalize

/** Codegen'd Unicode canonicalization: NFC convergence of byte-
  * different spellings, the whitespace/case cascade, null safety, and
  * the SQL surface. */
class NormalizeTextSpec extends SparkSuite {

  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("t").select(text_normalize(col("t"))).collect().head.getString(0)

  test("precomposed and combining spellings converge under NFC") {
    val precomposed = "Café"       // é as one codepoint
    val combining = "Café"        // e + combining acute
    assert(precomposed != combining, "inputs must differ byte-wise")
    assert(norm(precomposed) == norm(combining))
    assert(norm(precomposed) == "café")
  }

  test("case folds and ragged whitespace collapses, edges trimmed") {
    assert(norm("  Hello \t\t WORLD \n again  ") == "hello world again")
    assert(norm("Über  NAÏVE") == "über naïve")
    assert(norm("") == "")
    assert(norm("   \t\n ") == "")
  }

  test("null passes through; non-string input is rejected at analysis") {
    val out = Seq(Some("A"), None).toDF("t")
      .select(text_normalize(col("t"))).collect()
    assert(out(0).getString(0) == "a" && out(1).isNullAt(0))
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("t").select(text_normalize(col("t"))).collect()
    }
  }

  test("registered SQL surface: text_normalize works in plain SQL") {
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql("SELECT text_normalize('  FOÓ  bar ') AS n")
      .collect().head.getString(0)
    assert(r == "foó bar")
  }

  test("normalization is idempotent on the real corpus") {
    val docs = graft.io.Tables.load(spark, sf("sf0.001"), "documents")
    val once = docs.select(text_normalize(col("text")).as("n1"))
    val twice = once.select(col("n1"), text_normalize(col("n1")).as("n2"))
    assert(twice.filter(col("n1") =!= col("n2")).isEmpty)
  }
}
