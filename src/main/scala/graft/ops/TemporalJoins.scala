package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins absent from both the reference and Spark's built-in
  * operator set (SURVEY §2.4 "not present in reference: nested-loop,
  * range/interval, as-of joins"), composed from built-ins per the
  * custom-operator preference order — option (a), no Catalyst
  * internals needed.
  */
object TemporalJoins {

  /** As-of join: for every left row, the latest right row with
    * `rightTs <= leftTs` within the same `key` (the market-data /
    * latest-dimension-version lookup).
    *
    * Plan shape: tag both sides, union, ONE shuffle on (key) with a
    * per-key time-ordered window, and `last(right value, ignoreNulls)`
    * carries the most recent right row forward onto each left row.
    * Never builds the per-key cross product, and skew follows the key
    * distribution exactly like any keyed window. `rightCols` are the
    * value columns to carry (renamed as given). */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String,
           rightCols: Map[String, String]): DataFrame =
    asOfCore(left, right, key, leftTs, rightTs, rightCols,
      toleranceSeconds = None, caller = "asOf")

  /** As-of join with a tolerance (pandas merge_asof semantics): like
    * [[asOf]], but a carried right row EXPIRES once it is more than
    * `toleranceSeconds` older than the left timestamp — the lookup
    * comes back null instead of serving arbitrarily stale state (the
    * market-data "quote too old" rule). Same plan shape as [[asOf]]
    * (one keyed shuffle, one window pass, no per-key cross product);
    * the right timestamp rides inside the carry struct and the age
    * check is a map-side scalar afterwards, so the tolerance adds
    * zero exchanges. The expiry runs AFTER the carry, so it never
    * changes WHICH right row is carried — "latest at-or-before, then
    * freshness-checked".
    *
    * Unlike plain [[asOf]] (any ordered type), BOTH timestamp columns
    * must be TimestampType: the age check subtracts `unix_micros`,
    * which has no meaning for ints/strings. Checked eagerly here with
    * a caller-named error — without it the requirement only surfaced
    * as an analysis error deep in the plan (ADVICE r9). */
  def asOfWithin(left: DataFrame, right: DataFrame, key: String,
                 leftTs: String, rightTs: String,
                 rightCols: Map[String, String],
                 toleranceSeconds: Long): DataFrame = {
    require(toleranceSeconds >= 0, s"negative tolerance: $toleranceSeconds")
    Seq(("left", leftTs, left), ("right", rightTs, right)).foreach {
      case (side, c, df) =>
        val dt = df.schema(c).dataType
        require(dt == org.apache.spark.sql.types.TimestampType,
          s"asOfWithin: $side timestamp column '$c' is $dt but the " +
            "tolerance check needs TimestampType (unix_micros age " +
            "subtraction) - cast it, or use asOf for tolerance-free " +
            "joins on any ordered type")
    }
    asOfCore(left, right, key, leftTs, rightTs, rightCols,
      toleranceSeconds = Some(toleranceSeconds), caller = "asOfWithin")
  }

  /** One body for both as-of flavors, so the ordering/carry contract
    * lives in exactly one place. `__rts` (the carried right
    * timestamp) joins the carry struct only when a tolerance asks
    * for it — the plain asOf plan stays as narrow as before. */
  private def asOfCore(left: DataFrame, right: DataFrame, key: String,
                       leftTs: String, rightTs: String,
                       rightCols: Map[String, String],
                       toleranceSeconds: Option[Long],
                       caller: String): DataFrame = {
    val reserved = Set("__ts", "__side", "__carry", "__rts")
    val collisions = rightCols.values.toSet.intersect(left.columns.toSet) ++
      reserved.intersect(left.columns.toSet) ++
      // a rename TARGET may not shadow the internals either
      reserved.intersect(rightCols.values.toSet)
    require(collisions.isEmpty,
      s"$caller carried-column names collide with left/internal columns: " +
        s"$collisions — rename them")
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val rtsCol: Seq[Column] =
      if (toleranceSeconds.isDefined) Seq(col(rightTs).as("__rts")) else Nil
    val rTagged = right
      .select(col(key) +: col(rightTs).as("__ts") +: rtsCol ++:
        rightCols.toSeq.map { case (from, to) => col(from).as(to) }: _*)
      .withColumn("__side", lit(0))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // right rows sort before left rows at the same timestamp, so a
    // right row AT the left timestamp is visible to it. The final
    // order key makes ties between equal-timestamp right rows
    // deterministic (largest carried tuple wins).
    val carryCols = rightCols.values.toSeq
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts") +: col("__side") +: carryCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    // carry the whole right row as ONE struct: a null FIELD inside the
    // latest right row stays null (per-column last(ignoreNulls) would
    // resurrect a stale older value for that column)
    val structCols = rtsCol.map(_ => col("__rts")) ++ carryCols.map(col)
    val carried = unioned
      .withColumn("__carry", last(
        when(col("__side") === 0, struct(structCols: _*)),
        ignoreNulls = true).over(w))
    val keep: Column = toleranceSeconds match {
      case Some(tol) => col("__carry").isNotNull &&
        unix_micros(col("__ts")) - unix_micros(col("__carry").getField("__rts")) <=
          lit(tol * 1000000L)
      case None => lit(true)
    }
    carryCols.foldLeft(carried) { (df, v) =>
      df.withColumn(v, when(keep, col("__carry").getField(v)))
    }
      .where(col("__side") === 1)
      .drop("__ts", "__side", "__carry", "__rts")
  }

  /** Interval (range) join: pair each point row with every interval
    * row of the same `key` where `start <= ts < end`, WITHOUT a per-key
    * cross product: both sides are bucketized on time (intervals
    * explode over the buckets they span), the join is an equi-join on
    * (key, bucket), and the exact containment predicate filters the
    * candidates. Shuffle volume tracks interval span / bucketSize, the
    * tuning knob. Timestamps are epoch-microsecond longs internally. */
  def intervalJoin(points: DataFrame, intervals: DataFrame, key: String,
                   ts: String, start: String, end: String,
                   bucket: Column => Column): DataFrame = {
    require(!points.columns.contains("__b") && !intervals.columns.contains("__b"),
      "input already has a __b column")
    val p = points.withColumn("__b", bucket(col(ts)))
    val i = intervals.withColumn("__b",
      explode(sequence(bucket(col(start)), bucket(col(end)))))
    // each point has exactly one bucket, so every (point, interval)
    // pair matches at most once — no dedup needed, multiplicity of
    // duplicate input rows is preserved
    p.join(i, Seq(key, "__b"))
      .where(col(ts) >= col(start) && col(ts) < col(end))
      .drop("__b")
  }

  /** Convenience bucketizer: epoch-microseconds → `seconds`-wide bucket. */
  def secondsBucket(seconds: Long): Column => Column =
    c => floor(unix_micros(c) / lit(seconds * 1000000L)).cast("long")
}
