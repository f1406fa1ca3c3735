package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiling for data-quality gates in ingestion pipelines:
  * per-column row count, null count, exact distinct count, and
  * type-aware min/max rendered to stable strings. One wide aggregation
  * pass per column batch (Spark fuses them into a single HashAggregate —
  * one scan), then unpivoted to long form.
  *
  * At 100 TB: swap `countDistinct` for `approx_count_distinct` (HLL) —
  * exact distinct is a full shuffle per column; the profile shape stays
  * identical. */
object Profile {

  private def render(c: Column, t: DataType): Column = t match {
    case DoubleType | FloatType => format_string("%.4f", c)
    case TimestampType | TimestampNTZType => date_format(c, "yyyy-MM-dd HH:mm:ss")
    case DateType => date_format(c, "yyyy-MM-dd")
    case _ => c.cast(StringType)
  }

  /** Long-format profile of the given columns (array/map/struct columns
    * are skipped — no total order). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val flat = cols.filter(c => df.schema(c).dataType match {
      case _: ArrayType | _: MapType | _: StructType => false
      case _ => true
    })
    val aggs = flat.flatMap { c =>
      val t = df.schema(c).dataType
      Seq(count(lit(1)).as(s"${c}__n"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
          countDistinct(col(c)).as(s"${c}__distinct"),
          render(min(col(c)), t).as(s"${c}__min"),
          render(max(col(c)), t).as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = flat.map { c =>
      struct(lit(c).as("col_name"),
        col(s"${c}__n").as("n"), col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_value"), col(s"${c}__max").as("max_value"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}
