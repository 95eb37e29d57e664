package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` form of the reference's ValueHistogram report
  * (.../lib/aggregate/ValueHistogram.java:38,52,83: per key — count,
  * distinct-ish, mean, stddev, min, max). SURVEY §7.3's "custom
  * Aggregator (small, isolated)" tier: a mutable buffer merged
  * map-side and across partitions, exactly the combiner/reducer split,
  * expressed once and reused as a `Column` via `udaf`.
  *
  * Moments are tracked as (n, Σx, Σx²) so merge is O(1) and the buffer
  * is fixed-size at any scale (stddev via the moment identity; the
  * report matches `stddev_pop` up to double associativity).
  */
object ValueHistogramAgg {

  case class Buf(n: Long, sum: Double, sumSq: Double,
                 min: Double, max: Double)

  case class Report(count: Long, mean: Double, stddev: Double,
                    min: Double, max: Double)

  val aggregator: Aggregator[Double, Buf, Report] =
    new Aggregator[Double, Buf, Report] {
      def zero: Buf = Buf(0L, 0.0, 0.0, Double.PositiveInfinity, Double.NegativeInfinity)
      def reduce(b: Buf, x: Double): Buf =
        Buf(b.n + 1, b.sum + x, b.sumSq + x * x, math.min(b.min, x), math.max(b.max, x))
      def merge(a: Buf, b: Buf): Buf =
        Buf(a.n + b.n, a.sum + b.sum, a.sumSq + b.sumSq,
          math.min(a.min, b.min), math.max(a.max, b.max))
      def finish(b: Buf): Report =
        if (b.n == 0) Report(0L, Double.NaN, Double.NaN, Double.NaN, Double.NaN)
        else {
          val mean = b.sum / b.n
          val variance = math.max(0.0, b.sumSq / b.n - mean * mean)
          Report(b.n, mean, math.sqrt(variance), b.min, b.max)
        }
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Report] = Encoders.product[Report]
    }

  /** Column form for untyped `groupBy(...).agg(...)`. */
  def histogram(c: Column): Column = udaf(aggregator).apply(c)
}
