package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftExtensions, VectorExpressions}

class VectorDotSpec extends SparkSuite {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (1L, Array(0.5f, -0.5f, 0.0f), Array(2.0f, 2.0f, 9.0f))
  ).toDF("id", "a", "b")

  test("vector_dot matches the interpreted built-in fold exactly") {
    val builtin = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val rows = vecs.select(
      VectorExpressions.vector_dot(col("a"), col("b")).as("native"),
      builtin.as("interp")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // bit-equal
    assert(rows(0).getDouble(0) == 32.0)
    assert(rows(1).getDouble(0) == 0.0)
  }

  test("vector_dot handles float/double mixed inputs") {
    val d = vecs.withColumn("bd", transform(col("b"), x => x.cast("double")))
    val r = d.select(VectorExpressions.vector_dot(col("a"), col("bd"))).first()
    assert(r.getDouble(0) == 32.0 || r.getDouble(0) == 0.0)
  }

  test("vector_dot is null-safe") {
    val d = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    assert(d.select(VectorExpressions.vector_dot(col("a"), col("b")))
      .first().isNullAt(0))
  }

  test("fused vector_cosine is bit-equal to the composed dot/(norm*norm)") {
    val withZero = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (1L, Array(0.5f, -0.5f, 0.0f), Array(2.0f, 2.0f, 9.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)), // zero norm
      (3L, Array(-1.5f, 2.25f, 8.0f), Array(7.0f, -0.125f, 3.5f))
    ).toDF("id", "a", "b")
    def composed(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      def d(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        VectorExpressions.vector_dot(x, y)
      d(a, b) / (sqrt(d(a, a)) * sqrt(d(b, b)))
    }
    val rows = withZero.select(col("id"),
      VectorExpressions.vector_cosine(col("a"), col("b")).as("fused"),
      composed(col("a"), col("b")).as("composed")).collect()
    rows.foreach { r =>
      // bit-equal, including the zero-norm row where non-ANSI Divide
      // makes the composed form NULL (x/0 -> NULL) — fused must match
      assert(r.isNullAt(1) === r.isNullAt(2), s"row ${r.getLong(0)} nullness")
      if (!r.isNullAt(1))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(1))
          === java.lang.Double.doubleToLongBits(r.getDouble(2)),
          s"row ${r.getLong(0)}")
    }
    assert(rows.find(_.getLong(0) == 2L).exists(_.isNullAt(1)),
      "zero-norm cosine is NULL under non-ANSI division semantics")
  }

  test("extension registration makes vector_dot usable from SQL") {
    GraftExtensions.register(spark)
    vecs.createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT vector_dot(a, b) AS d FROM vecs WHERE id = 0").first()
    assert(r.getDouble(0) == 32.0)
  }
}
