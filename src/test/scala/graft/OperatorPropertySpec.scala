package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._
import graft.text.Similarity

/** Property invariants for the custom operators: cosine geometry over
  * generated vectors, as-of join monotonicity, range-join window
  * membership. Deterministic ScalaCheck sampling (fixed seeds). */
class OperatorPropertySpec extends SparkSuite {
  import spark.implicits._

  private def forSamples[A](g: Gen[A], n: Int = 15)(f: A => Unit): Unit =
    (0 until n).foreach(i => g.apply(Gen.Parameters.default, Seed(7L + i)).foreach(f))

  private val vec = Gen.listOfN(16,
    Gen.chooseNum(-10.0f, 10.0f).suchThat(v => !v.isNaN))
    .suchThat(_.exists(_ != 0f)).map(_.toArray)

  test("cosine is symmetric, bounded, and 1 on self") {
    forSamples(Gen.zip(vec, vec), n = 10) { case (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val r = df.select(
        Similarity.cosine(col("a"), col("b")).as("ab"),
        Similarity.cosine(col("b"), col("a")).as("ba"),
        Similarity.cosine(col("a"), col("a")).as("aa")).first()
      assert(r.getDouble(0) == r.getDouble(1))           // symmetry (bit-equal)
      assert(math.abs(r.getDouble(0)) <= 1.0 + 1e-9)     // Cauchy-Schwarz
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)      // self-similarity
    }
  }

  test("as-of join result times never exceed trade times") {
    val quoteGen = Gen.listOfN(12, Gen.zip(Gen.chooseNum(0, 100), Gen.chooseNum(1.0, 9.0)))
    val tradeGen = Gen.listOfN(8, Gen.chooseNum(0, 110))
    forSamples(Gen.zip(quoteGen, tradeGen), n = 10) { case (qs, ts) =>
      val quotes = qs.distinctBy(_._1).toDF("t", "px").withColumn("k", lit("x"))
      val trades = ts.distinct.zipWithIndex.toDF("t", "id").withColumn("k", lit("x"))
      val got = graft.ops.AsOf.asofJoin(trades, quotes, "t", Seq("k"), Seq("px"))
        .collect()
      assert(got.length == ts.distinct.length) // exactly one row per trade
      val qMap = qs.distinctBy(_._1).sortBy(_._1)
      got.foreach { r =>
        val t = r.getAs[Int]("t")
        val expected = qMap.filter(_._1 <= t).lastOption.map(_._2)
        val actual = if (r.isNullAt(r.fieldIndex("px"))) None
                     else Some(r.getAs[Double]("px"))
        assert(actual == expected, s"trade@$t got $actual expected $expected")
      }
    }
  }

  test("range join emits exactly the pairs inside the window") {
    val evGen = Gen.listOfN(20, Gen.chooseNum(0L, 5000L))
    forSamples(evGen, n = 10) { times =>
      val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
      val rows = times.distinct.zipWithIndex.map { case (s, i) =>
        (i.toLong, java.sql.Timestamp.from(base.plusSeconds(s)))
      }
      val l = rows.toDF("id", "ts").withColumn("k", lit(1))
      val r = rows.toDF("rid", "v_ts").withColumn("k", lit(1))
        .withColumnRenamed("ts", "v_ts")
      val got = graft.ops.RangeJoin.intervalJoin(l, r, "ts", "v_ts", -60L, 60L, Seq("k"))
        .select("id", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val byId = rows.toMap
      val expected = (for {
        (i, ti) <- rows; (j, tj) <- rows
        di = ti.getTime; dj = tj.getTime
        if dj >= di - 60000 && dj < di + 60000
      } yield (i, j)).toSet
      assert(got == expected)
    }
  }
}
