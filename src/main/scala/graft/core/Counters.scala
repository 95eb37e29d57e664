package graft.core

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Job counters — the capability of Hadoop's counter framework
  * (TaskCounter enum .../mapreduce/TaskCounter.java:27-55; user
  * counters via context.getCounter().increment()).
  *
  * Built on `Dataset.observe`, which aggregates metrics inside the
  * existing plan (no extra pass, streaming-safe) rather than
  * accumulators (which double-count on task retry — wrong at scale,
  * where retries and speculation are routine).
  *
  * Caveat when ASSERTING counter values: do not put a global sort
  * (`orderBy`) above an observe whose counts you read — range
  * partitioning SAMPLES its child in a separate job first, so the
  * observed node executes twice and every counter doubles. Read
  * counters from plans that act on the observed frame directly
  * (write, collect, agg), or sort after a materialization boundary.
  */
object Counters {

  /** Attach named metrics to a frame; read them from the returned
    * Observation after an action completes. */
  def observed(df: DataFrame, name: String, metrics: (String, Column)*): (DataFrame, Observation) = {
    val obs = Observation(name)
    val cols = metrics.map { case (n, c) => c.as(n) }
    (df.observe(obs, cols.head, cols.tail: _*), obs)
  }

  /** The standard record counter: rows that flowed past this point. */
  def recordCount(df: DataFrame, name: String = "records"): (DataFrame, Observation) =
    observed(df, name, "count" -> count(lit(1)))
}
