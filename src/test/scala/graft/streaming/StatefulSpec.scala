package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StatefulSpec extends SparkSpec {
  import spark.implicits._
  import StatefulOps._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:${min}%02d:00")

  test("mapGroupsWithState keeps running counts across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = runningCounts(ms.toDS()).writeStream
      .format("memory").queryName("counts").outputMode("update").start()
    try {
      ms.addData(Event(ts(0), 1L, 1.0), Event(ts(1), 1L, 1.0), Event(ts(2), 2L, 1.0))
      q.processAllAvailable()
      ms.addData(Event(ts(3), 1L, 1.0))
      q.processAllAvailable()
      val last = spark.table("counts").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(last == Map(1L -> 3L, 2L -> 1L))
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits session summary on timeout") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Event]
    // default (once-per-available-data) trigger: timeouts are evaluated
    // at the next batch after the processing-time horizon passes.
    val q = sessionSummaries(ms.toDS(), gapMs = 50).writeStream
      .format("memory").queryName("sessions").outputMode("append").start()
    try {
      ms.addData(Event(ts(0), 9L, 2.0), Event(ts(1), 9L, 3.0))
      // Never call processAllAvailable here: once a processing-time
      // timeout is registered the engine keeps scheduling no-data
      // micro-batches and processAllAvailable may never quiesce.
      // Instead poll the sink until the timeout-driven summary lands.
      def summary() = spark.table("sessions").as[SessionOut].collect()
        .find(s => s.userId == 9L && s.n == 2L && s.sum == 5.0)
      var waited = 0
      while (summary().isEmpty && waited < 120) { Thread.sleep(250); waited += 1 }
      assert(summary().isDefined, s"no session summary for user 9 after 30s")
    } finally q.stop()
  }
}
