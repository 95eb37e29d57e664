package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Pins [[StatefulOps.runningStatsTws]] — the transformWithState
  * (state v2) surface: typed ValueState accumulates across
  * micro-batches, and the final per-key stats equal the batch
  * groupBy over the same data (stream/batch parity). RocksDB state
  * store is set for the query's session conf and restored after —
  * transformWithState rejects the default HDFS-backed provider. */
class TransformWithStateSpec extends SparkSpec {
  import spark.implicits._
  import StatefulOps._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:${min}%02d:00")

  test("running (count, sum) accumulates across micro-batches; parity with batch agg") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Event]
      val q = runningStatsTws(ms.toDS()).writeStream
        .format("memory").queryName("tws_stats").outputMode("update").start()
      try {
        val batch1 = Seq(Event(ts(0), 1L, 2.0), Event(ts(1), 1L, 3.0), Event(ts(2), 2L, 5.0))
        val batch2 = Seq(Event(ts(3), 1L, 7.0), Event(ts(4), 3L, 1.0))
        ms.addData(batch1: _*)
        q.processAllAvailable()
        ms.addData(batch2: _*)
        q.processAllAvailable()
        val last = spark.table("tws_stats").as[(Long, Long, Double)].collect()
          .groupBy(_._1).view.mapValues(rs => rs.maxBy(_._2)).toMap
        // stream result == batch groupBy over the union of batches
        val expected = (batch1 ++ batch2).groupBy(_.userId)
          .map { case (u, es) => u -> ((u, es.size.toLong, es.map(_.value).sum)) }
        assert(last == expected, s"$last vs $expected")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming funnel advances per stage and agrees with the batch funnel on ordered input") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[TypedEvent]
      val q = funnelTws(ms.toDS(), Seq("view", "click", "purchase")).writeStream
        .format("memory").queryName("tws_funnel").outputMode("append").start()
      try {
        // batch 1: user 1 view+click (click strictly later); user 2's
        // click arrives BEFORE any view — must not advance
        ms.addData(
          TypedEvent(ts(0), 1L, "view"), TypedEvent(ts(1), 1L, "click"),
          TypedEvent(ts(0), 2L, "click"))
        q.processAllAvailable()
        // batch 2: user 1 purchases; user 2 finally views
        ms.addData(TypedEvent(ts(2), 1L, "purchase"), TypedEvent(ts(1), 2L, "view"))
        q.processAllAvailable()
        val rows = spark.table("tws_funnel").as[(Long, Int, Timestamp)].collect().toSet
        assert(rows == Set(
          (1L, 1, ts(0)), (1L, 2, ts(1)), (1L, 3, ts(2)),
          (2L, 1, ts(1))), rows.toString)
        // parity: max reached stage matches the batch funnel over the same events
        val batchDf = Seq(
          (1L, "view", ts(0)), (1L, "click", ts(1)), (1L, "purchase", ts(2)),
          (2L, "click", ts(0)), (2L, "view", ts(1))).toDF("user", "etype", "at")
        val batch = graft.ops.Funnels.funnel(batchDf, "user", "etype", "at",
            Seq("view", "click", "purchase"))
          .select("user", "stage").as[(Long, Long)].collect().toMap
        val stream = rows.groupBy(_._1).view.mapValues(_.map(_._2).max.toLong).toMap
        assert(stream == batch.filter(_._2 > 0), s"$stream vs $batch")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("event-time timers close sessions when the watermark passes the gap; session_window parity") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Event]
      // 5-minute quiet gap, tight 1-second out-of-orderness bound
      val q = sessionCloseTws(ms.toDS(), gapMs = 5 * 60 * 1000L, delay = "1 second")
        .writeStream.format("memory").queryName("tws_sessions")
        .outputMode("append").start()
      try {
        // user 1: events at 00:00 and 00:02 (one session);
        // user 2: event at 00:01
        ms.addData(Event(ts(0), 1L, 2.0), Event(ts(2), 1L, 3.0), Event(ts(1), 2L, 5.0))
        q.processAllAvailable()
        // nothing may close yet: watermark still behind the deadlines
        assert(spark.table("tws_sessions").isEmpty)
        // a later event (user 3, 00:20) advances the max event time;
        // the watermark computed from it (00:19:59) passes both
        // deadlines (00:07, 00:06) on the FOLLOWING batch
        ms.addData(Event(ts(20), 3L, 1.0))
        q.processAllAvailable()
        ms.addData(Event(ts(21), 3L, 1.0))
        q.processAllAvailable()
        val rows = spark.table("tws_sessions").as[SessionOut].collect().toSet
        assert(rows == Set(SessionOut(1L, 2L, 5.0), SessionOut(2L, 1L, 5.0)), rows.toString)
        // parity: the closed sessions equal session_window's batch
        // answer (same 5-minute gap) over the same closed-user events
        import org.apache.spark.sql.functions._
        val batch = Seq(Event(ts(0), 1L, 2.0), Event(ts(2), 1L, 3.0), Event(ts(1), 2L, 5.0))
          .toDF()
          .groupBy(session_window(col("ts"), "5 minutes"), col("userId"))
          .agg(count(lit(1)).as("n"), sum("value").as("s"))
          .select(col("userId"), col("n"), col("s"))
          .as[(Long, Long, Double)].collect()
          .map(t => SessionOut(t._1, t._2, t._3)).toSet
        assert(rows == batch, s"$rows vs $batch")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("a post-close arrival starts a FRESH session (state and timer were freed)") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Event]
      val q = sessionCloseTws(ms.toDS(), gapMs = 5 * 60 * 1000L, delay = "1 second")
        .writeStream.format("memory").queryName("tws_sessions2")
        .outputMode("append").start()
      try {
        ms.addData(Event(ts(0), 1L, 2.0))
        q.processAllAvailable()
        ms.addData(Event(ts(20), 1L, 7.0)) // advances watermark AND re-keys user 1
        q.processAllAvailable()
        ms.addData(Event(ts(40), 2L, 1.0))
        q.processAllAvailable()
        ms.addData(Event(ts(59), 2L, 1.0))
        q.processAllAvailable()
        val rows = spark.table("tws_sessions2").as[SessionOut].collect().toSet
        // first session (n=1, sum=2) closed by the 00:20 arrival's
        // watermark; second (n=1, sum=7) closed by the 00:40 one
        assert(rows.contains(SessionOut(1L, 1L, 2.0)) && rows.contains(SessionOut(1L, 1L, 7.0)),
          rows.toString)
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("ListState top-k: bounded state accumulates the true running top-3") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Event]
      val q = runningTopKTws(ms.toDS(), k = 3).writeStream
        .format("memory").queryName("tws_topk").outputMode("update").start()
      try {
        ms.addData(Event(ts(0), 1L, 5.0), Event(ts(1), 1L, 2.0), Event(ts(2), 1L, 9.0))
        q.processAllAvailable()
        ms.addData(Event(ts(3), 1L, 7.0), Event(ts(4), 1L, 1.0))
        q.processAllAvailable()
        val rows = spark.table("tws_topk").as[(Long, Seq[Double])].collect()
        // last emission for user 1 = top-3 over all five values
        val last = rows.last._2
        assert(last == Seq(9.0, 7.0, 5.0), rows.mkString(", "))
        // first batch's emission was the top-3 of the first three
        assert(rows.head._2 == Seq(9.0, 5.0, 2.0), rows.mkString(", "))
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
