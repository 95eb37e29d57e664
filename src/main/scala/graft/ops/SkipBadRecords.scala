package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Row}
import org.apache.spark.util.LongAccumulator

/** Poison-record tolerance — the capability of the reference's
  * skip-mode (.../mapred/SkipBadRecords.java:55, which binary-searches
  * around records that crash the user function after task failures).
  *
  * Declaratively this is simpler and cheaper: wrap the record-level
  * function in try/catch inside `mapPartitions`, drop (and count) the
  * failures, and never fail the task — no retries, no binary search,
  * no lost sibling records. For source-level corruption Spark's
  * PERMISSIVE mode / badRecordsPath already covers the scan; this
  * utility covers user transforms.
  */
object SkipBadRecords {

  /** Apply `f` per row, skipping rows where it throws. The returned
    * accumulator holds the skipped count (a Hadoop-style counter). */
  def mapSkipBad[T: Encoder](df: DataFrame, f: Row => T,
                             counterName: String = "skipped_records"): (Dataset[T], LongAccumulator) = {
    val skipped = df.sparkSession.sparkContext.longAccumulator(counterName)
    val out = df.mapPartitions { it =>
      it.flatMap { row =>
        try Iterator.single(f(row))
        catch { case scala.util.control.NonFatal(_) => skipped.add(1L); Iterator.empty }
      }
    }
    (out, skipped)
  }
}
