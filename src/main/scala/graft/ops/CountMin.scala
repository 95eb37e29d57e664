package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch as a first-class aggregate structure: a d×w grid
  * of counters where each key increments one cell per row-hash, and a
  * point estimate is the MIN over its d cells — never an undercount,
  * overcounts bounded by collisions (Cormode & Muthukrishnan 2005).
  *
  * Scale posture: the sketch frame is EXACTLY d·w rows no matter how
  * many input rows or distinct keys — the whole point at 100 TB. Build
  * is one hash-aggregate (map-side combined); estimation broadcast-joins
  * the d·w-row sketch, so probing never shuffles the probe set. Two
  * sketches over disjoint row sets merge by cellwise SUM (spec-pinned),
  * which is how shard-local sketches roll up without touching raw keys.
  *
  * Hashes are md5-derived (row index salted into the preimage), so the
  * structure is bit-deterministic across engines and runs — the same
  * rule lets the DuckDB oracle rebuild the identical grid (q211).
  *
  * Reference capability twin: per-key counting that Hadoop users ran as
  * wordcount-family jobs when only a bounded summary was needed
  * (hadoop-mapreduce-examples WordCount.java:1 scale-out counting);
  * the sketch answers the same point queries in O(d·w) memory.
  */
object CountMin {

  /** md5-derived column index for `key` in sketch row `rowI` (0-based),
    * uniform over [0, w). First 8 hex chars → 32-bit value → mod w:
    * bias from the mod is ≤ w/2^32, irrelevant for practical w. */
  private[ops] def cellCol(rowI: Column, key: Column, w: Int): Column =
    pmod(conv(substring(md5(concat(rowI.cast("string"), lit("|"),
      key.cast("string")).cast("binary")), 1, 8), 16, 10).cast("long"), lit(w))

  /** Build the sketch: one row per non-empty cell,
    * (row_i, col_i, cnt). Empty cells are implicit zeros. */
  def sketch(df: DataFrame, keyCol: String, d: Int = 4, w: Int = 64): DataFrame = {
    require(d >= 1 && w >= 2, s"count-min needs d>=1, w>=2; got d=$d w=$w")
    df.select(col(keyCol).as("__k"),
        explode(sequence(lit(0), lit(d - 1))).as("row_i"))
      .select(col("row_i").cast("long").as("row_i"),
        cellCol(col("row_i"), col("__k"), w).as("col_i"))
      .groupBy("row_i", "col_i").agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate the count of every key in `keys` (a small frame
    * with column `keyCol`): MIN over the key's d cells, where a cell
    * absent from the sparse sketch frame counts as its implicit zero.
    * Present keys increment all d of their cells, so for them the
    * zeros never fire; a key the sketch never saw gets the standard
    * count-min answer — 0 whenever any of its cells is untouched —
    * instead of vanishing or over-estimating through an inner join. */
  def estimate(sketchDf: DataFrame, keys: DataFrame, keyCol: String,
               d: Int = 4, w: Int = 64): DataFrame = {
    val probes = keys
      .withColumn("row_i", explode(sequence(lit(0), lit(d - 1))))
      .withColumn("row_i", col("row_i").cast("long"))
      .withColumn("col_i", cellCol(col("row_i"), col(keyCol), w))
    // LEFT join + zero-coalesce restores the implicit-zero cells the
    // sparse representation elides (ADVICE r8).
    probes.join(broadcast(sketchDf), Seq("row_i", "col_i"), "left")
      .groupBy(keys.columns.map(col).toIndexedSeq: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Merge shard-local sketches (same d, w): cellwise sum. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("row_i", "col_i")
      .agg(sum("cnt").as("cnt"))
}
