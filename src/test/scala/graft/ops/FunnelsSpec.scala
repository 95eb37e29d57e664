package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

/** Pins [[Funnels.funnel]] (strict ordering between stages, partial
  * progress, stage 0 retention) and [[Funnels.retention]] (cohort
  * day math, once-per-day counting). */
class FunnelsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events(rows: (Long, String, String)*) =
    rows.map { case (u, t, at) => (u, t, ts(at)) }.toDF("user", "etype", "at")

  test("full conversion, strictly ordered") {
    val df = events(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 11:00:00"),
      (1L, "purchase", "2024-01-01 12:00:00"))
    val got = Funnels.funnel(df, "user", "etype", "at", Seq("view", "click", "purchase"))
      .as[(Long, Long, Option[Timestamp], Option[Timestamp], Option[Timestamp])]
      .collect().toSeq
    assert(got == Seq((1L, 3L, Some(ts("2024-01-01 10:00:00")),
      Some(ts("2024-01-01 11:00:00")), Some(ts("2024-01-01 12:00:00")))), got.toString)
  }

  test("a click BEFORE the first view does not convert; a later one does") {
    val df = events(
      (1L, "click", "2024-01-01 09:00:00"), // too early — ignored
      (1L, "view", "2024-01-01 10:00:00"),
      (2L, "click", "2024-01-01 09:00:00"),
      (2L, "view", "2024-01-01 10:00:00"),
      (2L, "click", "2024-01-01 10:30:00")) // after the view — counts
    val got = Funnels.funnel(df, "user", "etype", "at", Seq("view", "click"))
      .as[(Long, Long, Option[Timestamp], Option[Timestamp])]
      .collect().sortBy(_._1).toSeq
    assert(got.map(g => (g._1, g._2)) == Seq((1L, 1L), (2L, 2L)), got.toString)
    assert(got(1)._4.contains(ts("2024-01-01 10:30:00")))
  }

  test("stage is the highest reached; users with no stage events keep row 0") {
    val df = events(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 11:00:00"),
      (1L, "purchase", "2024-01-01 12:00:00"),
      (2L, "error", "2024-01-01 10:00:00"))
    val got = Funnels.funnel(df, "user", "etype", "at", Seq("view", "click", "purchase"))
      .select("user", "stage").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 3L), (2L, 0L)), got.toString)
  }

  test("equal timestamps do NOT satisfy the strictly-after rule") {
    val df = events(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:00:00"))
    val got = Funnels.funnel(df, "user", "etype", "at", Seq("view", "click"))
      .select("user", "stage").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L)), got.toString)
  }

  test("rolling active: trailing window counts, no ghost days past the last date") {
    val df = events(
      (1L, "view", "2024-01-01 10:00:00"),
      (2L, "view", "2024-01-01 11:00:00"),
      (1L, "view", "2024-01-03 10:00:00"),
      (3L, "view", "2024-01-05 10:00:00"))
    val got = Funnels.rollingActive(df, "user", "at", windowDays = 3)
      .as[(java.sql.Date, Long)].collect()
      .map { case (d, n) => d.toString -> n }.toMap
    // day1: {1,2}; day3 window 01-03: {1,2}∪{1} = {1,2}; day5 window
    // 03-05: {1,3}. Days 2 and 4 had no activity → no row (spine).
    assert(got == Map("2024-01-01" -> 2L, "2024-01-03" -> 2L, "2024-01-05" -> 2L), got.toString)
    // a user active twice in the window still counts once
    val dup = Funnels.rollingActive(events(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-02 10:00:00")), "user", "at", 3)
      .as[(java.sql.Date, Long)].collect().map { case (d, n) => d.toString -> n }.toMap
    assert(dup == Map("2024-01-01" -> 1L, "2024-01-02" -> 1L), dup.toString)
  }

  test("retention: cohort day offsets, one count per user-day") {
    val df = events(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 23:00:00"), // same day — counted once
      (1L, "view", "2024-01-03 09:00:00"),
      (2L, "view", "2024-01-02 08:00:00"),
      (2L, "view", "2024-01-03 08:00:00"))
    val got = Funnels.retention(df, "user", "at")
      .as[(java.sql.Date, Long, Long)].collect()
      .map { case (c, o, n) => (c.toString, o, n) }.sortBy(x => (x._1, x._2)).toSeq
    assert(got == Seq(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-02", 0L, 1L), ("2024-01-02", 1L, 1L)), got.toString)
  }
}
