package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Descriptor-driven aggregation registry — the capability of the
  * reference's ValueAggregator framework
  * (hadoop-mapreduce-client-core/.../lib/aggregate/
  * ValueAggregatorJob.java:85, ValueAggregatorBaseDescriptor.java:39-53),
  * where a job is configured from strings like `"LongValueSum:field"`.
  *
  * Descriptors here are `"function:field[:alias]"`. Every function maps
  * to a built-in Catalyst aggregate, so partial (map-side) aggregation —
  * the combiner the reference wires by hand (Job.setCombinerClass,
  * Job.java:935) — happens automatically in `HashAggregateExec`, and
  * everything stays inside whole-stage codegen.
  *
  * `uniq` is exact (`countDistinct`); `uniq~N` maps the reference's
  * capped `UniqValueCount(maxNumItems)` (UniqValueCount.java:35,88) to
  * HyperLogLog (`approx_count_distinct`) — the memory cap the reference
  * approximates with a bounded TreeMap is an accuracy knob here, which
  * is the right trade at 100 TB.
  * `histogram` reproduces ValueHistogram.java:38's report columns
  * (count / distinct / mean / stddev / min / max) as a struct.
  */
object ValueAggregators {

  def parse(desc: String): Column = {
    val parts = desc.split(":")
    require(parts.length >= 2, s"descriptor needs function:field, got: $desc")
    val (fn, field) = (parts(0), parts(1))
    val alias = if (parts.length > 2) parts(2) else s"${fn}_$field".replace("~", "_")
    val c = col(field)
    val agg: Column = fn match {
      case "sum"                       => sum(c)
      case "dsum"                      => round(sum(c), 4)
      case "min"                       => min(c)
      case "max"                       => max(c)
      case "avg"                       => avg(c)
      case "davg"                      => round(avg(c), 4)
      case "dstd"                      => round(stddev_pop(c), 4)
      case "count"                     => count(c)
      case "uniq"                      => countDistinct(c)
      // uniq~N: the reference's capped UniqValueCount bounds memory by
      // item count; HLL bounds it by sketch size, so the cap maps to a
      // relative-error knob (HLL stderr ≈ 1.04/√m). N must be numeric.
      case s if s.startsWith("uniq~") =>
        val cap = s.stripPrefix("uniq~").toInt
        require(cap > 0, s"uniq~ cap must be positive: $desc")
        approx_count_distinct(c, math.min(0.4, math.max(0.005, 1.04 / math.sqrt(cap.toDouble))))
      // pNN / pNN~ : exact / sketched percentile (e.g. p50, p95~)
      case s if s.matches("p\\d{1,2}~?") =>
        val q = s.stripPrefix("p").stripSuffix("~").toInt / 100.0
        if (s.endsWith("~")) percentile_approx(c, lit(q), lit(10000))
        else round(expr(s"percentile($field, $q)"), 4)
      case "histogram" => struct(
        count(c).as("count"), countDistinct(c).as("distinct"),
        round(avg(c), 4).as("mean"), round(stddev_pop(c), 4).as("stddev"),
        min(c).as("min"), max(c).as("max"))
      case other => throw new IllegalArgumentException(s"unknown aggregator: $other")
    }
    agg.as(alias)
  }

  /** groupBy(keys).agg(descriptors…) in one call. */
  def aggregate(df: DataFrame, groupCols: Seq[String], descriptors: Seq[String]): DataFrame = {
    val aggs = descriptors.map(parse)
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
