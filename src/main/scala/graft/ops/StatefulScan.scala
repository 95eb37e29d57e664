package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Per-key ORDERED stateful scan for NON-ASSOCIATIVE recurrences —
  * clipped accumulators, credit limits, token buckets: state where
  * `bal_i = f(bal_{i-1}, x_i)` does not decompose into any
  * prefix-aggregatable form, which is exactly the semantics SQL
  * window frames CANNOT express (a running SUM is associative; a
  * clipped running sum is not). The batch twin of
  * `transformWithState`'s per-key loop, built on
  * [[SecondarySort.groupedSorted]]: one hash repartition, a
  * partition-local sort, and a single-pass group iterator — no
  * per-group buffering, no driver loop, no global sort.
  *
  * 100 TB posture: cost identical to the secondary sort it rides
  * (one shuffle by key); state is O(1) per key held in the scan
  * variable; groups never span partitions.
  */
object StatefulScan {

  /** Clipped running sum per key: `bal = max(floor, bal + delta)`
    * with the balance INITIALIZED to `floor` (so the first row yields
    * `max(floor, floor + delta)`), rows visited in `sortCols` order
    * within each key.
    *
    * @param keyCol   grouping column (long)
    * @param idCol    row identity carried to the output (long)
    * @param deltaCol signed increments (long)
    * @return (keyCol, idCol, balance) one row per input row
    */
  def clippedRunningSum(df: DataFrame, keyCol: String, idCol: String,
                        deltaCol: String, sortCols: Seq[Column],
                        floor: Long = 0L,
                        numPartitions: Int = 0): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // the per-row getAs[Long] calls below would surface an Int (or
    // other) column as an opaque task-time ClassCastException — name
    // the offending argument up front instead (the loud in-plan
    // convention of the sibling ops)
    for ((arg, c) <- Seq("keyCol" -> keyCol, "idCol" -> idCol, "deltaCol" -> deltaCol)) {
      val dt = df.schema(c).dataType
      require(dt == org.apache.spark.sql.types.LongType,
        s"StatefulScan.clippedRunningSum: $arg '$c' must be LongType, got $dt — cast it first")
    }
    implicit val enc = org.apache.spark.sql.Encoders.product[(Long, Long, Long)]
    SecondarySort.groupedSorted[Long, (Long, Long, Long)](
        df, keyCol, sortCols, parts)(
        _.getAs[Long](keyCol),
        (k, rows) => {
          var bal = floor
          rows.map { r =>
            bal = math.max(floor, bal + r.getAs[Long](deltaCol))
            (k, r.getAs[Long](idCol), bal)
          }
        })
      .toDF(keyCol, idCol, "balance")
  }

  /** Exponentially weighted moving average per key:
    * `ewma_1 = x_1; ewma_i = α·x_i + (1-α)·ewma_{i-1}` in `sortCols`
    * order — the canonical NON-associative smoothing recurrence (the
    * weights depend on each row's distance from the end, so no window
    * frame or prefix aggregation expresses it). Cross-engine
    * determinism: each step is two IEEE multiplies and one add in the
    * same order on both engines, so an oracle replaying the identical
    * recurrence (recursive CTE) reproduces the doubles bit-for-bit —
    * no rounding needed.
    *
    * @return (keyCol, idCol, x, ewma) one row per input row
    */
  def ewma(df: DataFrame, keyCol: String, idCol: String,
           valueCol: String, sortCols: Seq[Column], alpha: Double,
           numPartitions: Int = 0): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"StatefulScan.ewma: alpha must be in (0,1]: $alpha")
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    for ((arg, c) <- Seq("keyCol" -> keyCol, "idCol" -> idCol)) {
      val dt = df.schema(c).dataType
      require(dt == org.apache.spark.sql.types.LongType,
        s"StatefulScan.ewma: $arg '$c' must be LongType, got $dt — cast it first")
    }
    require(df.schema(valueCol).dataType == org.apache.spark.sql.types.DoubleType,
      s"StatefulScan.ewma: valueCol '$valueCol' must be DoubleType, got " +
        s"${df.schema(valueCol).dataType} — cast it first")
    implicit val enc = org.apache.spark.sql.Encoders.product[(Long, Long, Double, Double)]
    SecondarySort.groupedSorted[Long, (Long, Long, Double, Double)](
        df, keyCol, sortCols, parts)(
        _.getAs[Long](keyCol),
        (k, rows) => {
          var prev = Double.NaN
          rows.map { r =>
            val x = r.getAs[Double](valueCol)
            prev = if (prev.isNaN) x else alpha * x + (1 - alpha) * prev
            (k, r.getAs[Long](idCol), x, prev)
          }
        })
      .toDF(keyCol, idCol, "x", "ewma")
  }

  /** Sessionization with BOTH a quiet-gap cut and a MAX-DURATION cap —
    * the contract `session_window` cannot express (its sessions extend
    * indefinitely while events keep arriving; bot traffic produces
    * week-long "sessions"). A new session starts when the gap since
    * the previous event exceeds `gapUs` OR the current session's span
    * would exceed `maxDurUs` (measured first-event to this event,
    * microseconds). Non-associative: a row's session depends on where
    * every earlier cut fell, which is exactly the per-key ordered scan
    * this operator family exists for.
    *
    * @return (keyCol, idCol, ts_us, session_ord) — 1-based ordinal per
    *         key in time order
    */
  def cappedSessions(df: DataFrame, keyCol: String, idCol: String,
                     tsUsCol: String, gapUs: Long, maxDurUs: Long,
                     numPartitions: Int = 0): DataFrame = {
    require(gapUs > 0 && maxDurUs > 0,
      s"StatefulScan.cappedSessions: gapUs/maxDurUs must be positive: $gapUs/$maxDurUs")
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    for ((arg, c) <- Seq("keyCol" -> keyCol, "idCol" -> idCol, "tsUsCol" -> tsUsCol)) {
      val dt = df.schema(c).dataType
      require(dt == org.apache.spark.sql.types.LongType,
        s"StatefulScan.cappedSessions: $arg '$c' must be LongType, got $dt — cast it first")
    }
    implicit val enc = org.apache.spark.sql.Encoders.product[(Long, Long, Long, Long)]
    SecondarySort.groupedSorted[Long, (Long, Long, Long, Long)](
        df, keyCol, Seq(col(tsUsCol), col(idCol)), parts)(
        _.getAs[Long](keyCol),
        (k, rows) => {
          var ord = 0L
          var sessStart = Long.MinValue
          var prevTs = Long.MinValue
          rows.map { r =>
            val ts = r.getAs[Long](tsUsCol)
            if (ord == 0L || ts - prevTs > gapUs || ts - sessStart > maxDurUs) {
              ord += 1L; sessStart = ts
            }
            prevTs = ts
            (k, r.getAs[Long](idCol), ts, ord)
          }
        })
      .toDF(keyCol, idCol, "ts_us", "session_ord")
  }
}
