package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Distributed inclusive running sum over a TOTAL order — the
  * two-phase prefix scan ([[graft.llm.Packing]]'s machinery made
  * generic): range-partition by the order key, per-partition totals
  * (pass 1, O(partitions) to the driver), broadcast exclusive
  * offsets, then a partition-local walk (pass 2) — NEVER a
  * single-partition window, which is the usual way running totals
  * stop scaling.
  *
  * The order key must be UNIQUE (checked for free during pass 1,
  * loud failure on duplicates — tie placement would make the running
  * value nondeterministic; pre-aggregate ties to one row per key
  * first, which is also what makes the running value at a key
  * well-defined).
  */
object PrefixSum {

  /** @return the input plus `outCol` = inclusive running sum of
    *         `valueCol` (integral) in `orderCol` order
    */
  def runningSum(df: DataFrame, orderCol: String, valueCol: String,
                 outCol: String = "running",
                 numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
                else spark.sessionState.conf.numShufflePartitions
    val arranged = df.repartitionByRange(parts, col(orderCol))
      .sortWithinPartitions(orderCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val valAt = arranged.schema.fieldIndex(valueCol)
    val keyAt = arranged.schema.fieldIndex(orderCol)
    def valOf(r: Row): Long = r.get(valAt) match {
      case i: Int => i.toLong
      case l: Long => l
      case s: Short => s.toLong
      case other => sys.error(s"$valueCol must be integral, got $other")
    }
    val partSums = arranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      var prev: Any = null
      it.foreach { r =>
        if (r.isNullAt(keyAt))
          sys.error(s"runningSum: null $orderCol value - the walk needs a total order")
        val k = r.get(keyAt)
        if (prev != null && prev == k)
          sys.error(s"runningSum: duplicate $orderCol value '$k' - " +
            "pre-aggregate ties to one row per key")
        prev = k
        s += valOf(r)
      }
      Iterator.single(pid -> s)
    }.collect().toMap
    val nParts = arranged.rdd.getNumPartitions
    val offsets = new Array[Long](nParts)
    var acc = 0L
    for (pid <- 0 until nParts) {
      offsets(pid) = acc
      acc += partSums.getOrElse(pid, 0L)
    }
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    val withRun = arranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = bcOffsets.value(pid)
      it.map { r =>
        run += valOf(r)
        Row.fromSeq(r.toSeq :+ run)
      }
    }
    spark.createDataFrame(withRun,
      arranged.schema.add(outCol, LongType, nullable = false))
  }
}
