package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions for SQL use. Activate with either
  * `.withExtensions(new GraftExtensions)` on the builder, or
  * `spark.sql.extensions=graft.functions.GraftExtensions` in config —
  * then `SELECT vector_dot(a, b)` works in plain Spark SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.vectorDot)
  }
}

object GraftExtensions {
  val vectorDot: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vector_dot"),
    new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
    (children: Seq[Expression]) => VectorDot(children(0), children(1)))

  /** Session-scoped registration for an already-built session (tests,
    * REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.asInstanceOf[FunctionRegistry]
      .registerFunction(vectorDot._1, vectorDot._2, vectorDot._3)
}
