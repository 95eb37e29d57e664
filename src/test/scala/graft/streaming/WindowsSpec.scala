package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming semantics pinned with MemoryStream fixtures: window
  * emission under watermark, late-data drop, session gaps, stateful
  * dedup — plus batch/stream parity for the tumbling shape. */
class WindowsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def streamOf(name: String)(
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)(
      batches: Seq[Seq[(Timestamp, Long, Double)]]): Seq[org.apache.spark.sql.Row] = {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long, Double)]
    val df = ms.toDF.toDF("ts", "user_id", "value")
    val q = build(df).writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      spark.table(name).collect().toSeq
    } finally q.stop()
  }

  test("tumbling windows emit when the watermark passes; late data dropped") {
    val rows = streamOf("tumble")(df =>
      Windows.tumbling(df, "user_id", "1 hour", Some("10 minutes")))(Seq(
      // window [0:00,1:00): 2 events for user 1
      Seq((ts(5), 1L, 1.0), (ts(20), 1L, 2.0)),
      // advance watermark far past the first window
      Seq((ts(200), 1L, 5.0)),
      // late event for the closed [0:00,1:00) window → must be dropped
      Seq((ts(30), 1L, 100.0)),
      // advance again so nothing else interferes
      Seq((ts(400), 2L, 1.0))))
    val w0 = rows.find(r => r.getAs[Timestamp]("window_start") == ts(0))
    assert(w0.isDefined, s"first window never emitted: $rows")
    assert(w0.get.getAs[Long]("n") == 2L, "late event leaked into closed window")
    assert(w0.get.getAs[Double]("sv") == 3.0)
  }

  test("sliding windows assign each event to every overlapping window") {
    val rows = streamOf("slide")(df =>
      Windows.sliding(df, "user_id", "1 hour", "30 minutes", Some("10 minutes")))(Seq(
      Seq((ts(45), 3L, 2.0)),   // overlaps windows starting 0:00 and 0:30
      Seq((ts(600), 3L, 1.0)))) // advance watermark to flush
    val hits = rows.filter(r => r.getAs[Long]("user_id") == 3L &&
      Seq(ts(0), ts(30)).contains(r.getAs[Timestamp]("window_start")))
    assert(hits.length == 2, s"expected 2 overlapping windows, got: $rows")
    assert(hits.forall(_.getAs[Double]("sv") == 2.0))
  }

  test("session windows split on gap") {
    val rows = streamOf("sess")(df =>
      Windows.sessions(df, "user_id", "30 minutes", Some("5 minutes")))(Seq(
      // two bursts 2h apart → two sessions for user 7
      Seq((ts(0), 7L, 1.0), (ts(10), 7L, 1.0), (ts(130), 7L, 1.0)),
      Seq((ts(600), 7L, 1.0)))) // advance watermark to flush
    val sessions = rows.filter(_.getAs[Long]("user_id") == 7L)
    assert(sessions.length == 2, s"expected 2 sessions, got: $sessions")
    assert(sessions.map(_.getAs[Long]("n")).sorted.toSeq == Seq(1L, 2L))
  }

  test("dropDuplicatesWithinWatermark dedups within horizon") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long, Double)]
    val df = ms.toDF.toDF("ts", "user_id", "value")
    val q = Windows.dedupWithinWatermark(df, "1 hour", "user_id", "value")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      ms.addData(Seq((ts(0), 1L, 5.0), (ts(1), 1L, 5.0), (ts(2), 1L, 6.0)))
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 2) // (1,5.0) deduped
    } finally q.stop()
  }

  test("stream-stream attribution join pairs effects with in-window causes only") {
    implicit val sqlCtx = spark.sqlContext
    val causes = MemoryStream[(Timestamp, Long)]
    val effects = MemoryStream[(Timestamp, Long)]
    val joined = Windows.attributionJoin(
      causes.toDF.toDF("ts", "ad_id"), effects.toDF.toDF("ts", "ad_id"),
      "ad_id", watermark = "10 minutes", within = "10 MINUTES")
      .selectExpr("cause.ad_id AS ad_id", "cause.ts AS cause_ts", "effect.ts AS effect_ts")
    val q = joined.writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    try {
      causes.addData(Seq(ts(0) -> 1L, ts(30) -> 2L))
      // effect at +5 min of cause 1 (in window); effect at +50 min of
      // cause 2 (out of window); effect with no cause at all
      effects.addData(Seq(ts(5) -> 1L, ts(80) -> 2L, ts(7) -> 9L))
      q.processAllAvailable()
      val rows = spark.table("attr")
        .as[(Long, Timestamp, Timestamp)].collect().toSet
      assert(rows == Set((1L, ts(0), ts(5))), rows)
    } finally q.stop()
  }

  test("file-replay parity: streaming over the events fixture equals the batch result") {
    // replay the real fixture through the streaming path (file source),
    // complete mode so every window is emitted regardless of watermark
    val batchEvents = graft.core.Tables.events(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("evreplay").toString
    batchEvents.write.parquet(s"$dir/in")
    val streamEvents = spark.readStream
      .schema(batchEvents.schema).parquet(s"$dir/in")
    val q = Windows.tumbling(streamEvents, "user_id", "1 hour")
      .writeStream.format("memory").queryName("replay").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("replay")
      val batch = Windows.tumbling(batchEvents, "user_id", "1 hour")
      assert(streamed.count() == batch.count())
      assert(streamed.except(batch).count() == 0 && batch.except(streamed).count() == 0)
    } finally q.stop()
  }

  test("batch/stream parity: tumbling on batch events equals groupBy date_trunc") {
    val events = graft.core.Tables.events(spark, sf)
    val viaOp = Windows.tumbling(events, "user_id", "1 hour")
      .orderBy("user_id", "window_start")
    val direct = events.groupBy(col("user_id"), date_trunc("hour", col("ts")).as("window_start"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sv"))
      .orderBy("user_id", "window_start")
    assert(viaOp.except(direct).count() == 0 && direct.except(viaOp).count() == 0)
  }
}
