package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed joins and aggregations. AQE's skew-join
  * handles most runtime skew (on by default in `core.Engine`); salting
  * is the declarative fallback when one key dominates so heavily that
  * even split shuffle blocks overwhelm a task — the 100 TB "null key /
  * celebrity key" case.
  *
  * Join shape: the skewed (big) side gets a deterministic salt in
  * [0, factor); the other side is replicated `factor`× with every
  * salt value; the join key becomes (key, salt). Each hot key fans out
  * over `factor` tasks. Aggregation shape: two-phase — partial
  * aggregate on (key, salt), final on key.
  */
object Salting {

  /** Per-row salt with a positional component: the hash mixes in
    * `monotonically_increasing_id()` (partition id in the high bits,
    * per-partition counter in the low bits), so even bitwise-identical
    * rows under one hot key — the classic skew shape — fan out across
    * all `factor` buckets. A content-only salt (hash of the row's
    * columns) silently defeats itself exactly there: duplicated records
    * all hash to ONE bucket. Not stable across runs/repartitioning —
    * irrelevant for salting, where any spread is correct because the
    * other side is replicated over every salt value.
    *
    * Retry caveat (the classic rand()-salt hazard): because the salt is
    * nondeterministic, a shuffle-map stage recomputed after a fetch
    * failure can assign recomputed rows different salts than the
    * already-fetched output — risking rare duplicated/lost rows IF the
    * upstream row set per partition is itself nondeterministic. Put
    * salted ops directly on deterministic input (a file scan, a
    * checkpointed frame); Spark additionally rolls back and re-runs
    * all reducers of an INDETERMINATE stage on such retries, which is
    * the engine-level mitigation for this exact pattern. */
  def salt(factor: Int, on: Column*): Column =
    pmod(hash((lit(42) +: monotonically_increasing_id() +: on): _*), lit(factor))

  /** Salted equi-join: `skewed` big side vs `other` side replicated
    * factor×. Result equals a plain inner join on `key`. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 factor: Int): DataFrame = {
    require(!skewed.columns.contains("__salt") && !other.columns.contains("__salt"),
      "input already has a __salt column")
    val left = skewed.withColumn("__salt", salt(factor))
    val right = other.withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
    left.join(right, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted two-phase aggregation: partial on (key, salt), final on
    * key. `partial` and `finalAgg` must compose (sum/sum, count/sum,
    * min/min, …). */
  def saltedAgg(df: DataFrame, key: String, factor: Int,
                partial: Column, partialAlias: String,
                finalAgg: String => Column): DataFrame = {
    require(!df.columns.contains("__salt"), "input already has a __salt column")
    df.withColumn("__salt", salt(factor))
      .groupBy(col(key), col("__salt"))
      .agg(partial.as(partialAlias))
      .groupBy(col(key))
      .agg(finalAgg(partialAlias).as(partialAlias))
  }
}
