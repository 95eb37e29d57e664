package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Single-pass column profiler — the DESCRIBE/data-quality primitive
  * (q141's shape generalized to any schema): null count, distinct
  * count and typed extrema for every column, computed by ONE
  * aggregate over ONE scan (Catalyst plans the multi-distinct via
  * Expand), then pivoted to long format with `stack`. Numeric,
  * string and temporal extrema keep their own typed columns so no
  * engine- or locale-specific value→string formatting enters
  * downstream comparisons.
  *
  * 100 TB posture: one scan, one (Expand-widened) aggregation, a
  * 1-row → n-columns stack. Distinct counts are EXACT (the audit
  * use-case); callers profiling ultra-high-cardinality columns at
  * interactive latency should reach for the HLL descriptors
  * (`agg.ValueAggregators`' `uniq~N`) instead.
  */
object Profiler {

  /** @return one row per profiled column:
    *         (col_name, dtype, n_nulls, n_distinct, min_num, max_num,
    *          min_str, max_str) — numeric extrema as double, all
    *         non-numeric extrema rendered through min/max on the
    *         column's own type then cast to string for temporal /
    *         boolean (deterministic ISO forms), left NULL for
    *         complex types.
    */
  def profile(df: DataFrame): DataFrame = {
    require(df.schema.nonEmpty, "profile: empty schema")
    val cols = df.schema.fields
    // names are interpolated into the stack() SQL below — reject the
    // ones that would silently break it (the avroWriteFlat lesson):
    // quotes and backticks break the literal, a backslash re-escapes
    // it (a name like a\nb would silently become a<newline>b)
    cols.foreach(f => require(!f.name.contains("'") && !f.name.contains("`")
        && !f.name.contains("\\"),
      s"profile: unsupported character in column name: ${f.name}"))
    val aggs = cols.zipWithIndex.flatMap { case (f, i) =>
      val c = col(f.name)
      val base = Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"nn$i"),
        countDistinct(c).as(s"nd$i"))
      f.dataType match {
        case _: NumericType =>
          base ++ Seq(min(c).cast("double").as(s"mn$i"),
            max(c).cast("double").as(s"mx$i"))
        case StringType =>
          base ++ Seq(min(c).as(s"ms$i"), max(c).as(s"mxs$i"))
        case _: DateType | _: TimestampType | _: TimestampNTZType |
             BooleanType =>
          base ++ Seq(min(c).cast("string").as(s"ms$i"),
            max(c).cast("string").as(s"mxs$i"))
        case _ => base // complex types: counts only
      }
    }
    val metrics = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex.map { case (f, i) =>
      val (mn, mx, ms, mxs) = f.dataType match {
        case _: NumericType => (s"mn$i", s"mx$i",
          "CAST(NULL AS STRING)", "CAST(NULL AS STRING)")
        case StringType | _: DateType | _: TimestampType |
             _: TimestampNTZType | BooleanType =>
          ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)", s"ms$i", s"mxs$i")
        case _ => ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
          "CAST(NULL AS STRING)", "CAST(NULL AS STRING)")
      }
      s"'${f.name}', '${f.dataType.simpleString}', nn$i, nd$i, $mn, $mx, $ms, $mxs"
    }
    metrics.select(expr(
      s"""stack(${cols.length}, ${rows.mkString(", ")})
         |AS (col_name, dtype, n_nulls, n_distinct, min_num, max_num,
         |    min_str, max_str)""".stripMargin))
      .orderBy("col_name")
  }
}
