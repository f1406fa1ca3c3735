package graft.io

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed `Dataset[T]` surface over the test tables — case-class models
  * with compile-time field checks for pipelines where schema is static
  * (SURVEY.md §1.5: `Dataset[T]` where type safety helps, `DataFrame`
  * where schema is dynamic). Encoders are Catalyst `ExpressionEncoder`s:
  * fields stay in Tungsten rows, and filters/projections written against
  * columns still push down — the typed view costs nothing until a
  * closure forces deserialization. */
object Typed {

  // parquet stores these timestamps non-UTC-adjusted → Spark reads
  // TIMESTAMP_NTZ → java.time.LocalDateTime in the typed view
  case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
                      l_linenumber: Int, l_quantity: Double,
                      l_extendedprice: Double, l_discount: Double,
                      l_tax: Double, l_returnflag: String,
                      l_linestatus: String, l_shipdate: java.time.LocalDateTime)

  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                   o_totalprice: Double, o_orderdate: java.time.LocalDateTime,
                   o_orderpriority: String)

  case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
                      c_acctbal: Double, c_mktsegment: String)

  case class Document(doc_id: Long, text: String, lang: String,
                      source: String, n_chars: Long)

  case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  def lineitem(spark: SparkSession, dir: String): Dataset[Lineitem] = {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem").as[Lineitem]
  }

  def orders(spark: SparkSession, dir: String): Dataset[Order] = {
    import spark.implicits._
    Tables.load(spark, dir, "orders").as[Order]
  }

  def customers(spark: SparkSession, dir: String): Dataset[Customer] = {
    import spark.implicits._
    Tables.load(spark, dir, "customer").as[Customer]
  }

  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents").as[Document]
  }

  def embeddings(spark: SparkSession, dir: String): Dataset[Embedding] = {
    import spark.implicits._
    Tables.load(spark, dir, "embeddings").as[Embedding]
  }
}
