package graft.report

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-layer renderer closing the reference's product loop (ref
  * `controller/app.py:505-581` `save_graph` + `:583-659` report
  * assembly): one standalone HTML line chart per asset and an index
  * page carrying the report-row values. No plotting library — the chart
  * is an inline SVG polyline, which is all the contract needs (an HTML
  * file per `(x, y)` frame with title and axis labels).
  *
  * Scale: rendering COLLECTS the frame — by design. Chart frames are
  * aggregated daily series (bounded cardinality), never raw rows; the
  * guard below refuses anything that looks like an unaggregated table,
  * so the collect can't silently become a driver OOM at 100 TB. */
object HtmlReport {

  /** Hard ceiling on chart points: a daily series spanning 250 years
    * fits; an unaggregated fact table does not. */
  val MaxPoints = 100000

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Locale-pinned decimal formatting: the default-locale `f`
    * interpolator emits ',' decimal separators on e.g. de_DE JVMs,
    * which corrupts SVG point lists. */
  private def fmt(pattern: String, args: Any*): String =
    String.format(java.util.Locale.ROOT, pattern,
      args.map(_.asInstanceOf[AnyRef]): _*)

  /** Render an ordered two-column frame as a standalone HTML line
    * chart. Mirrors the reference `save_graph` contract: named x/y
    * columns (missing column → error), empty frame → error, returns
    * the written path. */
  def saveGraph(df: DataFrame, xCol: String, yCol: String, title: String,
                filename: String, outDir: String): Path = {
    val cols = df.columns.toSet
    require(cols(xCol), s"column '$xCol' not in frame (has ${df.columns.mkString(", ")})")
    require(cols(yCol), s"column '$yCol' not in frame (has ${df.columns.mkString(", ")})")
    val rows = df.select(col(xCol).cast("string"), col(yCol).cast("double"))
      .filter(col(yCol).isNotNull)
      .limit(MaxPoints + 1).collect()
    require(rows.nonEmpty, "chart frame is empty")
    require(rows.length <= MaxPoints,
      s"chart frame exceeds $MaxPoints points — aggregate before rendering")

    val xs = rows.map(_.getString(0))
    val ys = rows.map(_.getDouble(1))
    val (w, h, padL, padB, padT) = (900.0, 360.0, 60.0, 40.0, 30.0)
    val (yMin, yMax) = (ys.min, ys.max)
    val ySpan = if (yMax > yMin) yMax - yMin else 1.0
    val pts = ys.zipWithIndex.map { case (y, i) =>
      val px = padL + (w - padL - 20) * (if (ys.length == 1) 0.5 else i.toDouble / (ys.length - 1))
      val py = padT + (h - padT - padB) * (1.0 - (y - yMin) / ySpan)
      fmt("%.1f,%.1f", px, py)
    }.mkString(" ")
    val html =
      s"""<!DOCTYPE html><html><head><meta charset="utf-8"><title>${esc(title)}</title></head>
         |<body><h2>${esc(title)}</h2>
         |<svg width="${w.toInt}" height="${h.toInt}" xmlns="http://www.w3.org/2000/svg">
         |  <rect width="100%" height="100%" fill="white"/>
         |  <polyline fill="none" stroke="blue" stroke-width="2" points="$pts"/>
         |  <text x="${padL}" y="${h - 8}" font-size="12">${esc(xs.head)}</text>
         |  <text x="${w - 150}" y="${h - 8}" font-size="12">${esc(xs.last)}</text>
         |  <text x="4" y="${padT + 10}" font-size="12">${fmt("%.4f", yMax)}</text>
         |  <text x="4" y="${h - padB}" font-size="12">${fmt("%.4f", yMin)}</text>
         |  <text x="${padL}" y="18" font-size="13">${esc(yCol)} vs ${esc(xCol)} (${ys.length} points)</text>
         |</svg></body></html>""".stripMargin

    val dir = Paths.get(outDir)
    Files.createDirectories(dir)
    val out = dir.resolve(filename)
    Files.writeString(out, html)
    out
  }

  /** The full report: one chart per asset (returnflag series) plus an
    * index page interpolating the [[Summary.reportRow]] values — the
    * engine-side equivalent of the reference's chart + email-body
    * assembly. Returns every file written (index first). */
  def writeReport(spark: SparkSession, sfDir: String, outDir: String): Seq[Path] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("flag")).orderBy(col("day"))
    val rets = graft.io.Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag").as("flag"), to_date(col("l_shipdate")).as("day"))
      .agg(graft.queries.Q.dsum(graft.queries.Q.revenue).as("price"))
      .withColumn("ret", graft.ops.Returns.pctChange(col("price"), w))
      .filter(col("ret").isNotNull)

    val assets = rets.select("flag").distinct().collect()
      .map(_.getString(0)).sorted.toSeq
    val charts = assets.map { a =>
      saveGraph(
        Summary.chartFrame(rets.filter(col("flag") === a), "day", "ret"),
        "day", "ret", s"Daily returns — asset $a", s"returns_$a.html", outDir)
    }

    val s = Summary.reportRow(spark, sfDir).first()
    val links = assets.map(a =>
      s"""<li><a href="returns_$a.html">asset $a</a></li>""").mkString("\n")
    val index =
      s"""<!DOCTYPE html><html><head><meta charset="utf-8"><title>Market report</title></head>
         |<body><h1>Market report</h1>
         |<p>Period: ${s.getAs[String]("period_start")} &ndash; ${s.getAs[String]("period_end")}
         | (${s.getAs[Long]("n_days")} days)</p>
         |<p>Mean daily return: ${s.getAs[String]("media_ret_fmt")}%</p>
         |<p>Total revenue (MM): ${s.getAs[String]("total_revenue_mm")}</p>
         |<ul>$links</ul>
         |</body></html>""".stripMargin
    val idx = Paths.get(outDir).resolve("index.html")
    Files.writeString(idx, index)
    idx +: charts
  }

  /** The reference's final product step (`controller/app.py`: run →
    * save_graph → send_email): write the report, then deliver the index
    * page as the HTML body with every chart attached, creds/endpoint
    * from the environment ([[Email.sendReport]]). Returns the files so
    * callers can also keep them on disk, as the reference does. */
  def emailReport(spark: SparkSession, sfDir: String, outDir: String,
      toEmail: String, env: String => Option[String] = sys.env.get): Seq[Path] = {
    val files = writeReport(spark, sfDir, outDir)
    val body = Files.readString(files.head)
    Email.sendReport("Market report", body, toEmail, files.tail, env)
    files
  }
}
