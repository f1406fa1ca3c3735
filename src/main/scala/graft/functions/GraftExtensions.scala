package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TableFunctionRegistry}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** SparkSessionExtensions entry point: registers graft's operator
  * surface for SQL use — the native codegen expression (`vector_dot`)
  * plus the text/similarity/sampling operators as composed-expression
  * functions, so a SQL-first user reaches every scalar operator
  * without touching the Scala API. Activate with either
  * `.withExtensions(new GraftExtensions)` on the builder, or
  * `spark.sql.extensions=graft.functions.GraftExtensions` in config —
  * then e.g. `SELECT graft_quality_score(text) FROM docs` works in
  * plain Spark SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach(e.injectFunction)
    GraftExtensions.tableFunctions.foreach(e.injectTableFunction)
    // `DESCRIBE DETAIL lake.`/p`` → `CALL lake.describe('/p')`
    e.injectParser((_, delegate) =>
      new graft.sources.GraftSqlParser(delegate))
  }
}

object GraftExtensions {

  type Registration =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def reg(name: String, arity: Int)(
      build: Seq[Column] => Column): Registration = (
    FunctionIdentifier(name),
    new ExpressionInfo(GraftExtensions.getClass.getName, name),
    (children: Seq[Expression]) => {
      require(children.length == arity,
        s"$name expects $arity argument(s), got ${children.length}")
      Bridge.expressionTree(build(children.map(Bridge.column)))
    })

  val vectorDot: Registration = (
    FunctionIdentifier("vector_dot"),
    new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
    (children: Seq[Expression]) => VectorDot(children(0), children(1)))

  /** Bucket count must be an integer literal (folds at plan time). */
  private val hashBucket: Registration = (
    FunctionIdentifier("graft_hash_bucket"),
    new ExpressionInfo(GraftExtensions.getClass.getName, "graft_hash_bucket"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_hash_bucket expects (key, buckets)")
      val buckets = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_hash_bucket: buckets must be an integer literal, got $other")
      }
      Bridge.expressionTree(
        graft.ops.Sampling.hashBucket(Bridge.column(children(0)), buckets))
    })

  val textNormalize: Registration = (
    FunctionIdentifier("text_normalize"),
    new ExpressionInfo(classOf[NormalizeText].getName, "text_normalize"),
    (children: Seq[Expression]) => NormalizeText(children.head))

  val all: Seq[Registration] = Seq(
    vectorDot,
    hashBucket,
    textNormalize,
    reg("graft_cosine", 2)(c => graft.text.Similarity.cosine(c(0), c(1))),
    reg("graft_fingerprint", 1)(c => graft.text.TextStats.fingerprint(c(0))),
    reg("graft_quality_score", 1)(c => graft.text.TextStats.qualityScore(c(0))),
    reg("graft_lang_id", 1)(c => graft.text.TextStats.predictedLang(c(0))),
    reg("graft_token_count", 1)(c => graft.text.TextStats.tokenCount(c(0))),
    reg("graft_scrub", 1)(c => graft.text.TextStats.scrub(c(0))),
    reg("graft_pii_count", 1)(c => graft.text.TextStats.piiCount(c(0))),
    reg("graft_md5_hash64", 1)(c => graft.text.Dedup.md5Hash64(c(0))))

  // ---- table-valued functions ----

  type TableRegistration =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)

  private def stringLit(e: Expression, fn: String): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: expected a string literal, got $other")
  }

  private def longLit(e: Expression, fn: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: expected an integer literal, got $other")
  }

  /** `SELECT * FROM lake_changes('/t', 1, 2)` — the row-level change
    * feed between two lake versions as a SQL table function (Delta's
    * `table_changes`), splicing [[graft.ops.Versioned.changes]]'s
    * file-pruned plan into the query: only files the two manifests
    * don't share are read, the carried-file deletion-vector delta is
    * picked by position, and the resulting scan is fully distributed —
    * the TVF builder does manifest-scale work only. Closes the last
    * CDC "needs the Scala API" gap: incremental consumers (the
    * `q_incr_mv` maintenance shape) can now be pure SQL end to end. */
  val lakeChanges: TableRegistration = (
    FunctionIdentifier("lake_changes"),
    new ExpressionInfo(GraftExtensions.getClass.getName, "lake_changes"),
    (children: Seq[Expression]) => {
      require(children.length == 3,
        "lake_changes expects (path, from_version, to_version)")
      val fn = "lake_changes"
      Bridge.plan(graft.ops.Versioned.changes(SparkSession.active,
        stringLit(children(0), fn),
        longLit(children(1), fn), longLit(children(2), fn)).df)
    })

  val tableFunctions: Seq[TableRegistration] = Seq(lakeChanges)

  /** Session-scoped registration for an already-built session (tests,
    * REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
      .asInstanceOf[FunctionRegistry]
    all.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
    val tvfRegistry = spark.sessionState.tableFunctionRegistry
      .asInstanceOf[TableFunctionRegistry]
    tableFunctions.foreach { case (id, info, builder) =>
      tvfRegistry.registerFunction(id, info, builder)
    }
  }
}
