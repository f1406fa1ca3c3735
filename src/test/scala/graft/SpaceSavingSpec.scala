package graft

import org.apache.spark.sql.functions._

import graft.functions.SpaceSavingAgg

/** Space-saving heavy hitters: bounded size, the three sketch
  * guarantees vs exact counts, exact top-k recovery on skewed data,
  * and stability across partitionings (the merge path). */
class SpaceSavingSpec extends SparkSuite {

  import spark.implicits._

  /** Zipf-ish stream: item i appears ~K/i times, plus a long tail of
    * singletons that forces constant eviction. */
  private def stream: Seq[String] =
    (1 to 20).flatMap(i => Seq.fill(400 / i)(s"hot$i")) ++
      (1 to 3000).map(i => s"tail$i")

  private def summarize(df: org.apache.spark.sql.DataFrame, cap: Int) =
    df.agg(SpaceSavingAgg.space_saving(col("tok"), cap).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.est"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("summary is bounded and obeys all three space-saving guarantees") {
    val cap = 32
    val data = stream
    val df = data.toDF("tok")
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = data.size.toLong
    val sk = summarize(df, cap)
    assert(sk.length == cap, "summary must be exactly at capacity here")
    // 1. never undercounts; 2. error brackets the truth
    sk.foreach { case (item, est, err) =>
      val truth = exact.getOrElse(item, 0L)
      assert(est >= truth, s"$item undercounted: $est < $truth")
      assert(est - err <= truth, s"$item bound broken: $est-$err > $truth")
    }
    // 3. every item with truth > N/cap is present
    val present = sk.map(_._1).toSet
    exact.filter { case (_, c) => c * cap > n }.keys.foreach { h =>
      assert(present(h), s"guaranteed heavy hitter $h missing")
    }
  }

  test("skewed heads are recovered exactly despite the churning tail") {
    val sk = summarize(stream.toDF("tok"), 32)
      .sortBy { case (i, est, _) => (-est, i) }
    // the top of the summary is the true top (hot1 > hot2 > hot3...)
    assert(sk.take(3).map(_._1).toSeq == Seq("hot1", "hot2", "hot3"))
  }

  test("guarantees survive arbitrary partitioning (merge path)") {
    val cap = 16
    val data = stream
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = data.size.toLong
    for (parts <- Seq(1, 7, 32)) {
      val sk = summarize(data.toDF("tok").repartition(parts), cap)
      assert(sk.length <= cap)
      sk.foreach { case (item, est, err) =>
        val truth = exact.getOrElse(item, 0L)
        assert(est >= truth, s"parts=$parts $item undercounted")
        assert(est - err <= truth, s"parts=$parts $item bound broken")
      }
      val present = sk.map(_._1).toSet
      exact.filter { case (_, c) => c * cap > n }.keys.foreach { h =>
        assert(present(h), s"parts=$parts heavy hitter $h missing")
      }
    }
  }

  test("small streams under capacity are exact") {
    val sk = summarize(Seq("a", "b", "a", "c", "a", "b").toDF("tok"), 8)
      .toSeq.sorted
    assert(sk == Seq(("a", 3L, 0L), ("b", 2L, 0L), ("c", 1L, 0L)))
  }
}
