package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end parity with the reference's Spark job
  * (ref `controller/script.py:67-108`): wide market table in →
  * `daily_returns` + `average_daily_return` out, preserving the
  * reference's semantic warts deliberately (SURVEY.md §7.5):
  *
  *  - null-fill 0 BEFORE returns → a 0-price day yields −100% that day
  *    and NULL (divide-by-zero) the next;
  *  - first row's return is NULL (lag over nothing);
  *  - `&` allowed in asset column names (`S&P500`);
  *  - the aggregate output drops `&` from names:
  *    `S&P500` → `Media_SP500_Retorno` (ref `controller/script.py:96-99`).
  */
object MarketPipeline {

  def assetColumns(df: DataFrame, dateCol: String = "Date"): Seq[String] =
    df.columns.filterNot(_ == dateCol).toSeq

  /** `daily_returns` output (ref `controller/script.py:33-50`). */
  def dailyReturns(df: DataFrame, from: String, to: String,
                   dateCol: String = "Date"): DataFrame =
    Returns.dailyReturnsWide(df, dateCol, assetColumns(df, dateCol), from, to)

  /** `average_daily_return` output (ref `controller/script.py:92-100`):
    * one row, `Media_<asset sans '&'>_Retorno` per asset; avg skips NULLs. */
  def averageDailyReturn(returns: DataFrame, assets: Seq[String]): DataFrame = {
    val cols = assets.map { a =>
      avg(col(s"${a}_Retorno")).as(s"Media_${a.replace("&", "")}_Retorno")
    }
    returns.agg(cols.head, cols.tail: _*)
  }

  /** Full job: returns frame + 1-row average frame. */
  def run(market: DataFrame, from: String, to: String,
          dateCol: String = "Date"): (DataFrame, DataFrame) = {
    val assets = assetColumns(market, dateCol)
    // Reference recomputes the returns lineage for the average (no cache,
    // ref `controller/script.py:90-100`); we cache — same results, one pass.
    val rets = dailyReturns(market, from, to, dateCol).cache()
    (rets, averageDailyReturn(rets, assets))
  }
}
