package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable log₂-binned quantile sketch — the O(bins) approximation
  * tier between an equi-width histogram and exact `percentile` (whose
  * per-group state is O(values)). Bin = floor(log₂ x) computed as
  * LENGTH(BIN(x)) − 1 over positive integers: no float log, no
  * boundary ulp, so shard histograms are integers end to end and
  * merge by count ADDITION (spec-pinned in SketchAggSpec). The
  * quantile rule is the first bin where 100·cum ≥ q·n — integer
  * cross-multiplication, no division — and the reported bound is the
  * bin's exact lower edge 2^b. Relative error is bounded by the bin
  * ratio (2×); subdivide bins (e.g. 4 sub-cells per octave) for
  * tighter bounds with the same integer discipline.
  *
  * Scale posture: one partial-agg shuffle to ≤64 bins per group at
  * ANY data size; the quantile extraction windows over the tiny
  * histogram, never the data. */
object QuantileSketch {

  /** floor(log₂ x) of a positive integer column, exact. Loud on
    * x ≤ 0 AND on NULL: `bin()` of a negative is the 64-char
    * two's-complement string (bin 63 — a garbage "quantile"), 0 would
    * conflate with 1, and a NULL would flow through as a null bin
    * that sorts first in the cumulative window yet still counts in n
    * — silently deflating every quantile bound (ADVICE r9). Callers
    * map their domain to positives first (e.g. `GREATEST(cents, 1)`
    * when 0 means "below the first bin", `COALESCE` or a filter for
    * nullable inputs). */
  def log2Bin(posInt: Column): Column =
    when(posInt.isNull || posInt <= 0, raise_error(concat(
      lit("QuantileSketch.log2Bin: non-positive or null value "),
      coalesce(posInt.cast("string"), lit("NULL")),
      lit(" - map the domain to positive integers first"))))
      .otherwise((length(bin(posInt)) - 1).cast("long"))

  /** Per-`keyCol` histogram of floor-log₂ bins of `posIntValue`
    * (a positive integer column): (keyCol, b, c). Mergeable across
    * shards by summing c on (keyCol, b). */
  def histogram(df: DataFrame, keyCol: String, posIntValue: Column): DataFrame =
    df.select(col(keyCol), log2Bin(posIntValue).as("b"))
      .groupBy(keyCol, "b").agg(count(lit(1)).as("c"))

  /** Quantile lower bounds (2^b) per key from a [[histogram]]:
    * (keyCol, n, p<q>_lb per requested percentile). */
  def quantiles(hist: DataFrame, keyCol: String, qs: Seq[Int]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 1 && q <= 100),
      s"percentiles must be in [1,100]: $qs")
    val wCum = Window.partitionBy(keyCol).orderBy("b")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist
      .withColumn("__cum", sum("c").over(wCum))
      .withColumn("__n", sum("c").over(Window.partitionBy(keyCol)))
    val aggs = max("__n").as("n") +: qs.map(q =>
      min(when(col("__cum") * 100 >= col("__n") * q, col("b"))).as(s"__b$q"))
    val lbs = qs.map(q =>
      expr(s"shiftleft(CAST(1 AS BIGINT), CAST(__b$q AS INT))").as(s"p${q}_lb"))
    cum.groupBy(keyCol).agg(aggs.head, aggs.tail: _*)
      .select(col(keyCol) +: col("n") +: lbs: _*)
  }
}
