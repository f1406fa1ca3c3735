package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftExtensions

/** The SQL function surface: every registered graft_* function returns
  * the same values as its Column-API twin, from plain SQL text. */
class SqlSurfaceSpec extends SparkSuite {

  private lazy val ready: Unit = {
    GraftExtensions.register(spark)
    graft.io.Tables.load(spark, sf("sf0.001"), "documents")
      .limit(50).createOrReplaceTempView("docs_sql")
  }

  test("text functions match the Column API from SQL") {
    ready
    val viaSql = spark.sql(
      """SELECT doc_id, graft_fingerprint(text) AS fp,
        |  graft_quality_score(text) AS q, graft_lang_id(text) AS lang,
        |  graft_token_count(text) AS n
        |FROM docs_sql ORDER BY doc_id""".stripMargin).collect()
    val viaApi = spark.table("docs_sql")
      .select(col("doc_id"),
        graft.text.TextStats.fingerprint(col("text")).as("fp"),
        graft.text.TextStats.qualityScore(col("text")).as("q"),
        graft.text.TextStats.predictedLang(col("text")).as("lang"),
        graft.text.TextStats.tokenCount(col("text")).as("n"))
      .orderBy("doc_id").collect()
    assert(viaSql.toSeq == viaApi.toSeq)
  }

  test("hash/sampling and vector functions work from SQL") {
    ready
    val r = spark.sql(
      """SELECT graft_md5_hash64('hello') AS h,
        |  graft_hash_bucket('hello', 1000) AS b,
        |  round(graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                     array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))), 6) AS cos,
        |  vector_dot(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))) AS dot
        |""".stripMargin).first()
    // 0x762A4BBC2A40415D = little-endian first 8 bytes of md5('hello'),
    // the value DuckDB's md5_number_upper returns
    assert(r.getAs[Long]("h") == 0x762A4BBC2A40415DL)
    assert(r.getAs[Long]("b") >= 0 && r.getAs[Long]("b") < 1000)
    assert(r.getAs[Double]("cos") == 1.0)
    assert(r.getAs[Double]("dot") == 6.0)
  }

  test("scrub and pii_count from SQL") {
    ready
    val r = spark.sql(
      "SELECT graft_scrub('mail a@b.co now') AS s, graft_pii_count('mail a@b.co now') AS n")
      .first()
    assert(r.getAs[String]("s") == "mail <EMAIL> now")
    assert(r.getAs[Int]("n") == 1)
  }

  test("non-literal bucket count is rejected at analysis") {
    ready
    val e = intercept[Exception] {
      spark.sql("SELECT graft_hash_bucket('x', doc_id) FROM docs_sql").collect()
    }
    assert(e.getMessage.contains("literal") || e.getMessage != null)
  }
}
