package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-mixture planning — turn per-source target weights into a
  * concrete replicated epoch (the DoReMi/Pile-style "domain X is 5×
  * over-represented relative to its size" knob): each source `s`
  * gets an integer repeat factor
  *
  *   r_s = ceil(T · w_s / (W · n_s))     (W = Σ w_s)
  *
  * — the smallest whole number of passes over `s` that reaches its
  * target share of a T-document epoch — and every document is
  * emitted once per repeat with a `replica` index (0..r_s-1) so a
  * downstream shuffle ([[Shuffling.shard]] on a (id, replica)
  * composite) spreads the copies through the epoch instead of
  * clustering them.
  *
  * Everything is integer arithmetic: the ceil is
  * `(T·w_s + W·n_s − 1) div (W·n_s)` in BigInt on the driver (counts
  * are collected — sources are a handful of corpora, the same
  * groups ≪ rows contract as `Sampling.temperatureSample`), so the
  * plan is engine-portable and reproducible. The replication itself
  * is `explode(sequence(0, r−1))` against a broadcast factor table —
  * map-side only, no shuffle: a 100 TB epoch plan is a scan, a
  * broadcast probe, and a generator.
  *
  * `maxRepeat` caps r_s — the standard guard against a tiny
  * high-weight source being duplicated hundreds of times (quality
  * collapses well before ~10 repeats; Muennighoff et al. 2023).
  */
object Mixing {

  /** One row per (document, replica): all input columns plus
    * `replica` (0-based). `weights` maps source values to relative
    * integer weights; sources absent from the map get weight
    * `defaultWeight`. A source with weight 0 is dropped entirely
    * (r_s = 0 — its documents leave the epoch). */
  def epochPlan(df: DataFrame, srcCol: String, weights: Map[String, Long],
                targetTotal: Long, defaultWeight: Long = 1L,
                maxRepeat: Long = 16L): DataFrame = {
    require(targetTotal >= 0, s"Mixing.epochPlan: targetTotal must be >= 0: $targetTotal")
    require(defaultWeight >= 0 && weights.values.forall(_ >= 0),
      "Mixing.epochPlan: weights must be non-negative")
    require(maxRepeat >= 1, s"Mixing.epochPlan: maxRepeat must be >= 1: $maxRepeat")
    // weights are keyed by STRING source values; on any other column
    // type every lookup would silently fall through to defaultWeight
    require(df.schema(srcCol).dataType == org.apache.spark.sql.types.StringType,
      s"Mixing.epochPlan: $srcCol must be a string column, got " +
        df.schema(srcCol).dataType.simpleString)
    require(!df.columns.contains("replica"),
      "Mixing.epochPlan: input already has a 'replica' column — the output " +
        "index would silently shadow it")
    val spark = df.sparkSession
    val counts = df.groupBy(col(srcCol)).agg(count(lit(1)).as("__n")).collect()
    val weightOf: Any => Long = {
      case s: String => weights.getOrElse(s, defaultWeight)
      case _ => defaultWeight // null / non-string source: default bucket
    }
    val totalW = counts.map(r => weightOf(r.get(0))).sum
    val factorRows = counts.map { r =>
      val n = BigInt(r.getLong(1))
      val w = BigInt(weightOf(r.get(0)))
      val repeats =
        if (totalW == 0L || w == 0) 0L
        else {
          val denom = BigInt(totalW) * n
          val r0 = (BigInt(targetTotal) * w + denom - 1) / denom // ceil
          r0.min(BigInt(maxRepeat)).toLong
        }
      org.apache.spark.sql.Row(r.get(0), repeats)
    }
    val fSchema = org.apache.spark.sql.types.StructType(Seq(
      df.schema(srcCol).copy(nullable = true),
      org.apache.spark.sql.types.StructField("__r", org.apache.spark.sql.types.LongType)))
    val factors = spark.createDataFrame(
      spark.sparkContext.parallelize(factorRows.toSeq, 1), fSchema)
    // widen narrow scans: the replica explode is the map stage that
    // feeds the epoch writer — one input file must not mean one task
    val wide = graft.core.Engine.widen(df)
    wide.join(broadcast(factors), wide(srcCol) <=> factors(srcCol))
      .where(col("__r") > 0L)
      .withColumn("replica", explode(sequence(lit(0L), col("__r") - 1L)))
      .select(wide.columns.map(wide(_)) :+ col("replica"): _*)
  }
}
