package graft.ops

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("asOf picks the latest right row at or before each left timestamp") {
    val trades = Seq(
      (1L, ts(5), "t1"), (1L, ts(20), "t2"), (1L, ts(3), "t0"),
      (2L, ts(10), "t3")).toDF("key", "ts", "trade")
    val quotes = Seq(
      (1L, ts(0), 100.0), (1L, ts(5), 105.0), (1L, ts(15), 110.0),
      (2L, ts(30), 999.0)).toDF("key", "qts", "px")
    val out = TemporalJoins.asOf(trades, quotes, "key", "ts", "qts",
      Map("px" -> "px"))
      .select("key", "trade", "px").as[(Long, String, Option[Double])]
      .collect().map(r => (r._2, r._3)).toMap
    assert(out("t0") == Some(100.0)) // before the 0:05 quote
    assert(out("t1") == Some(105.0)) // quote AT the trade time wins
    assert(out("t2") == Some(110.0))
    assert(out("t3") == None)        // no quote yet for key 2
  }

  test("asOf equals the naive per-row lookup on real events") {
    // right side: each user's first 5 events as 'versions'; left: all events
    val ev = graft.core.Tables.events(spark, sf).limit(500)
    val versions = ev.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy("ts", "event_id")))
      .where(col("rn") <= 5)
      .select(col("user_id"), col("ts").as("vts"), col("event_id").as("vid"))
    val got = TemporalJoins.asOf(
      ev.select("user_id", "ts", "event_id"), versions,
      "user_id", "ts", "vts", Map("vid" -> "vid"))
    // naive: join all pairs, keep max vts <= ts
    val naive = ev.select("user_id", "ts", "event_id").alias("l")
      .join(versions.alias("v"), col("l.user_id") === col("v.user_id") &&
        col("v.vts") <= col("l.ts"), "left")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("l.user_id"), col("l.event_id"))
          .orderBy(col("v.vts").desc_nulls_last, col("v.vid").desc_nulls_last)))
      .where(col("rk") === 1)
      .select(col("l.user_id"), col("l.event_id"), col("v.vid"))
    val gotS = got.select("user_id", "event_id", "vid")
    assert(gotS.except(naive).count() == 0 && naive.except(gotS).count() == 0)
  }

  test("asOf: a null FIELD in the latest right row is not papered over") {
    val trades = Seq((1L, ts(10), "t")).toDF("key", "ts", "trade")
    val quotes = Seq(
      (1L, ts(0), Some(100.0)), (1L, ts(5), None: Option[Double]))
      .toDF("key", "qts", "px")
    val out = TemporalJoins.asOf(trades, quotes, "key", "ts", "qts",
      Map("px" -> "px")).select("px").head
    assert(out.isNullAt(0), "stale px=100 resurfaced over the latest (null) value")
  }

  test("asOf rejects carried-column collisions with left columns") {
    val l = Seq((1L, ts(1), 1.0)).toDF("key", "ts", "px")
    val r = Seq((1L, ts(0), 2.0)).toDF("key", "qts", "px")
    intercept[IllegalArgumentException] {
      TemporalJoins.asOf(l, r, "key", "ts", "qts", Map("px" -> "px"))
    }
  }

  test("both as-of flavors reject rename targets that shadow internal columns") {
    val l = Seq((1L, ts(1), "t")).toDF("key", "ts", "trade")
    val r = Seq((1L, ts(0), 2.0)).toDF("key", "qts", "px")
    intercept[IllegalArgumentException] {
      TemporalJoins.asOfWithin(l, r, "key", "ts", "qts",
        Map("px" -> "__rts"), toleranceSeconds = 60)
    }
    intercept[IllegalArgumentException] {
      TemporalJoins.asOf(l, r, "key", "ts", "qts", Map("px" -> "__carry"))
    }
  }

  test("asOfWithin rejects non-timestamp ts columns eagerly with a named error") {
    // plain asOf accepts any ordered type; the tolerance variant's
    // unix_micros age check needs TimestampType — previously that
    // surfaced only as an analysis error deep in the plan (ADVICE r9)
    val l = Seq((1L, 5L, "t")).toDF("key", "ts", "trade")
    val r = Seq((1L, 4L, 2.0)).toDF("key", "qts", "px")
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.asOfWithin(l, r, "key", "ts", "qts",
        Map("px" -> "px"), toleranceSeconds = 60)
    }
    assert(e.getMessage.contains("asOfWithin") &&
      e.getMessage.contains("TimestampType"), e.getMessage)
    // the long-keyed pair still works through tolerance-free asOf
    assert(TemporalJoins.asOf(l, r, "key", "ts", "qts",
      Map("px" -> "px")).select("px").head.getDouble(0) == 2.0)
  }

  test("asOfWithin expires carried rows older than the tolerance") {
    val trades = Seq(
      (1L, ts(5), "fresh"),    // quote at 0:04, 60s old → within 120s
      (1L, ts(10), "stale"),   // same quote now 360s old → expired
      (1L, ts(4), "exact"),    // quote AT the trade time, age 0
      (2L, ts(10), "never"))   // no quote at all
      .toDF("key", "ts", "trade")
    val quotes = Seq((1L, ts(4), 105.0)).toDF("key", "qts", "px")
    val out = TemporalJoins.asOfWithin(trades, quotes, "key", "ts", "qts",
      Map("px" -> "px"), toleranceSeconds = 120)
      .select("trade", "px").as[(String, Option[Double])].collect().toMap
    assert(out("fresh") == Some(105.0))
    assert(out("exact") == Some(105.0))
    assert(out("stale") == None, "tolerance must expire the 6-minute-old quote")
    assert(out("never") == None)
  }

  test("asOfWithin keeps asOf's null-field and tie semantics") {
    // latest right row carries a null FIELD — the tolerance variant
    // must not resurrect the older non-null value either
    val trades = Seq((1L, ts(10), "t")).toDF("key", "ts", "trade")
    val quotes = Seq(
      (1L, ts(0), Some(100.0)), (1L, ts(9), None: Option[Double]))
      .toDF("key", "qts", "px")
    val out = TemporalJoins.asOfWithin(trades, quotes, "key", "ts", "qts",
      Map("px" -> "px"), toleranceSeconds = 3600).select("px").head
    assert(out.isNullAt(0), "stale px=100 resurfaced over the latest (null) value")
    // equal-timestamp right rows: largest carried tuple wins (asOf rule)
    val q2 = Seq((1L, ts(9), Some(7.0)), (1L, ts(9), Some(9.0)))
      .toDF("key", "qts", "px")
    val out2 = TemporalJoins.asOfWithin(trades, q2, "key", "ts", "qts",
      Map("px" -> "px"), toleranceSeconds = 3600)
      .select("px").as[Option[Double]].head
    assert(out2 == Some(9.0))
  }

  test("intervalJoin pairs points with containing intervals only") {
    val points = Seq((1L, ts(5)), (1L, ts(45)), (2L, ts(5))).toDF("key", "ts")
    val intervals = Seq(
      (1L, ts(0), ts(10), "a"), (1L, ts(40), ts(50), "b"),
      (1L, ts(4), ts(6), "c"), (2L, ts(20), ts(30), "d"))
      .toDF("key", "start", "end", "name")
    val out = TemporalJoins.intervalJoin(points, intervals, "key",
      "ts", "start", "end", TemporalJoins.secondsBucket(600))
      .select("key", "ts", "name").as[(Long, Timestamp, String)].collect().toSet
    assert(out == Set((1L, ts(5), "a"), (1L, ts(5), "c"), (1L, ts(45), "b")))
  }
}
