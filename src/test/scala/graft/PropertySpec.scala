package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._
import graft.ops.Validation

/** Property-based invariants (SURVEY.md §5.2 layer 2): the returns
  * formula, decimal-sum order independence, and validation acceptance
  * domains, over ScalaCheck-generated inputs (drawn with fixed seeds —
  * the scalatest/scalacheck bridge artifact is not on the offline
  * classpath, so generators are sampled directly and deterministically).
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def forSamples[A](g: Gen[A], n: Int = 20)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }

  private def forSamples2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 20)(
      f: (A, B) => Unit): Unit =
    (0 until n).foreach { i =>
      for (a <- ga.apply(Gen.Parameters.default, Seed(42L + i));
           b <- gb.apply(Gen.Parameters.default, Seed(1042L + i))) f(a, b)
    }

  private val prices = Gen.chooseNum(0.01, 1e7).map(p => math.round(p * 100) / 100.0)

  test("pct-change is 0 for equal consecutive prices and scale-invariant") {
    forSamples2(prices, Gen.chooseNum(0.1, 100.0), n = 10) { (p, k) =>
      {
        val df = Seq((1, p), (2, p), (3, p * 2)).toDF("t", "price")
        val w = org.apache.spark.sql.expressions.Window.orderBy(col("t"))
        val rets = df.withColumn("ret", graft.ops.Returns.pctChange(col("price"), w))
          .orderBy("t").collect()
        assert(rets(0).isNullAt(2))                            // first row NULL
        assert(math.abs(rets(1).getDouble(2)) < 1e-9)          // equal -> 0%
        assert(math.abs(rets(2).getDouble(2) - 100.0) < 1e-9)  // doubling -> +100%
        // scaling every price by k leaves returns unchanged
        val scaled = df.withColumn("price", col("price") * k)
          .withColumn("ret", graft.ops.Returns.pctChange(col("price"), w))
          .orderBy("t").collect()
        assert(math.abs(scaled(2).getDouble(2) - rets(2).getDouble(2)) < 1e-6)
      }
    }
  }

  test("decimal-exact sum is invariant under partitioning and ordering") {
    forSamples(Gen.listOfN(50, prices), n = 10) { xs =>
      {
        def total(n: Int, shuffled: Seq[Double]) =
          shuffled.zipWithIndex.toDF("v", "i").repartition(n)
            .agg(graft.queries.Q.dsum(col("v"))).first().getDouble(0)
        val t1 = total(1, xs)
        val t2 = total(7, scala.util.Random.shuffle(xs))
        assert(t1 == t2) // bit-equal, not approximately
      }
    }
  }

  test("date validation accepts exactly yyyy-MM-dd calendar dates") {
    val valid = for {
      y <- Gen.chooseNum(1900, 2100); m <- Gen.chooseNum(1, 12)
      d <- Gen.chooseNum(1, 28)
    } yield f"$y%04d-$m%02d-$d%02d"
    forSamples(valid, n = 40) { s => assert(Validation.isValidDate(s)) }
    forSamples(Gen.alphaNumStr, n = 40) { s =>
      if (!s.matches("""\d{4}-\d{2}-\d{2}""")) assert(!Validation.isValidDate(s))
    }
    assert(!Validation.isValidDate("2024-02-30"))
    assert(Validation.isValidDate("2024-02-29")) // leap year
    assert(!Validation.isValidDate("2023-02-29"))
  }

  test("fingerprint is invariant under whitespace runs and case") {
    val words = Gen.listOfN(8, Gen.alphaLowerStr.suchThat(_.nonEmpty))
    forSamples(words, n = 10) { ws =>
      if (ws.nonEmpty) {
        val base = ws.mkString(" ")
        val noisy = "  " + ws.map(_.toUpperCase).mkString("   ") + " "
        val fps = Seq((1L, base), (2L, noisy)).toDF("id", "text")
          .select(graft.text.TextStats.fingerprint(col("text")))
          .collect().map(_.getString(0))
        assert(fps(0) == fps(1))
      }
    }
  }
}
