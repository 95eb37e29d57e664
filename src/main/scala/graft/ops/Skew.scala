package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-distribution diagnosis — the report that decides whether a
  * join/aggregation key needs salting ([[Salting]]) or AQE skew
  * handling before the real job runs. The reference's equivalent is
  * the InputSampler + partition-histogram step a TotalOrderPartitioner
  * job runs to pick split points (`lib/partition/InputSampler.java:57`);
  * here the whole distribution summary is one partial-aggregated
  * groupBy plus a top-k heap — no sort, no collect of the key space.
  *
  * All ratios are integer (ppm and basis points of the mean), so the
  * report is engine-exact and diff-able across runs: `share_ppm =
  * cnt·1e6 / total`, `x_mean_bp = cnt·n_keys·1e4 / total` (10000 = a
  * key exactly at the mean; 320000 = 32× the mean — the classic
  * "one customer is a third of the table" red flag).
  */
object Skew {

  /** Top `topN` heaviest keys with count, share, and multiple-of-mean.
    * Two scalar aggregates (total rows, distinct keys) ride along as a
    * broadcast cross join — at any scale the heavy part is the one
    * partial-agg shuffle of (key, count) pairs; the top-k plans as
    * per-partition heaps (TakeOrdered), never a global sort.
    * (Integer headroom: `cnt · 1e6` stays inside a long up to ~9×10¹²
    * rows per key; the x-mean term multiplies cnt · n_keys · 1e4,
    * which CAN exceed a long on a high-cardinality table, so it runs
    * in DECIMAL(38,0) — exact to 38 digits, floored after the
    * division.) */
  def report(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    require(topN > 0, s"Skew.report: topN must be positive: $topN")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val totals = broadcast(counts.agg(
      sum(col("cnt")).as("__total"), count(lit(1)).as("__nkeys")))
    counts.crossJoin(totals)
      .select(col(keyCol), col("cnt"),
        expr("cnt * 1000000L div __total").as("share_ppm"),
        expr("CAST(floor(CAST(cnt AS DECIMAL(38,0)) * __nkeys * 10000 / __total) AS BIGINT)")
          .as("x_mean_bp"))
      .orderBy(col("cnt").desc, col(keyCol))
      .limit(topN)
  }
}
