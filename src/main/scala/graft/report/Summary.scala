package graft.report

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{CoreQueries, Q}

/** The reference's report layer, in-engine: the values its HTML email
  * body interpolates (ref `controller/app.py:189-201`: row count,
  * `Media_*` averages formatted `:.2f`, period dates reformatted
  * `yyyy-MM-dd` → `dd/MM/yyyy`, ref `controller/app.py:661-680`) and the
  * per-asset `(day, ret)` chart frame its plotly traces consume (ref
  * `controller/app.py:505-581`). Chart rendering/SMTP stay presentation-
  * side; the engine's contract is delivering exactly these frames. */
object Summary {

  /** One-row report summary: formatted period bounds, day count, and
    * 2-dp formatted mean return — `%.2f`/`printf` formatting, not
    * `format_number` (which inserts locale separators). */
  def reportRow(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
    CoreQueries.dailyRevenue(spark, dir)
      .filter(col("day") >= lit(CoreQueries.from) && col("day") <= lit(CoreQueries.to))
      .withColumn("ret", graft.ops.Returns.pctChange(col("price"), w))
      .agg(
        date_format(min(col("day")), "dd/MM/yyyy").as("period_start"),
        date_format(max(col("day")), "dd/MM/yyyy").as("period_end"),
        count(lit(1)).as("n_days"),
        format_string("%.2f", avg(col("ret"))).as("media_ret_fmt"),
        format_string("%.2f", (Q.dsum(col("price")) / lit(1000000.0))).as("total_revenue_mm"))
  }

  /** Chart frame for one asset: (day, ret) ordered — the exact input of
    * the reference's line trace. */
  def chartFrame(returns: DataFrame, dayCol: String, retCol: String): DataFrame =
    returns.select(col(dayCol), col(retCol)).orderBy(col(dayCol))
}
