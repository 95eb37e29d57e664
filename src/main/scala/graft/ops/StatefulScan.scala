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
}
