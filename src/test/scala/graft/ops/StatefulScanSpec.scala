package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Pins [[StatefulScan.clippedRunningSum]] against a naive in-memory
  * scanLeft — the recurrence is non-associative, so there is no
  * window-function reference to compare against (that inexpressibility
  * is the point of the op). */
class StatefulScanSpec extends SparkSpec {
  import spark.implicits._

  private def naive(rows: Seq[(Long, Long, Long)],
                    floor: Long): Map[(Long, Long), Long] =
    rows.groupBy(_._1).flatMap { case (k, rs) =>
      var bal = floor
      rs.sortBy(_._2).map { case (_, id, d) =>
        bal = math.max(floor, bal + d)
        (k, id) -> bal
      }
    }

  private def run(rows: Seq[(Long, Long, Long)],
                  floor: Long): Map[(Long, Long), Long] =
    StatefulScan.clippedRunningSum(
        rows.toDF("k", "id", "d"), "k", "id", "d", Seq(col("id")), floor)
      .as[(Long, Long, Long)].collect()
      .map { case (k, id, b) => (k, id) -> b }.toMap

  test("clips at the floor and matches the naive scan") {
    val rows = Seq(
      (1L, 1L, 50L), (1L, 2L, -80L), (1L, 3L, 30L), (1L, 4L, -10L),
      (2L, 1L, -5L), (2L, 2L, 100L), (2L, 3L, -40L))
    assert(run(rows, 0L) == naive(rows, 0L))
    // the clip actually engaged: key 1 row 2 would be -30 unclipped
    assert(run(rows, 0L)((1L, 2L)) == 0L)
    assert(run(rows, 0L)((1L, 3L)) == 30L)
  }

  test("a plain running sum (no clip hits) equals the window form") {
    val rows = (1L to 20L).map(i => (i % 3, i, i))
    val got = run(rows, Long.MinValue / 2)
    assert(got == naive(rows, Long.MinValue / 2))
  }

  test("nonzero floor starts and clips at the floor") {
    val rows = Seq((7L, 1L, -100L), (7L, 2L, 5L))
    val got = run(rows, 10L)
    assert(got == Map((7L, 1L) -> 10L, (7L, 2L) -> 15L))
  }

  test("many keys spread across partitions keep independent state") {
    val rows = (0L until 500L).map(i => (i % 50, i, if (i % 7 == 0) -3L else 2L))
    assert(run(rows, 0L) == naive(rows, 0L))
  }

  test("ewma matches the naive recurrence bit-for-bit") {
    val rows = (0L until 300L).map(i => (i % 7, i, (i * 37 % 101).toDouble))
    val naiveEwma: Map[(Long, Long), Double] =
      rows.groupBy(_._1).flatMap { case (k, rs) =>
        var prev = Double.NaN
        rs.sortBy(_._2).map { case (_, id, x) =>
          prev = if (prev.isNaN) x else 0.25 * x + 0.75 * prev
          (k, id) -> prev
        }
      }
    val got = StatefulScan.ewma(rows.toDF("k", "id", "x"), "k", "id", "x",
        Seq(col("id")), 0.25)
      .as[(Long, Long, Double, Double)].collect()
      .map { case (k, id, _, e) => (k, id) -> e }.toMap
    assert(got == naiveEwma) // exact ==: same IEEE op order
  }

  test("ewma rejects non-double value columns loudly") {
    val e = intercept[IllegalArgumentException] {
      StatefulScan.ewma(Seq((1L, 1L, 2L)).toDF("k", "id", "x"),
        "k", "id", "x", Seq(col("id")), 0.5)
    }
    assert(e.getMessage.contains("DoubleType"))
  }

  test("cappedSessions splits on gap, on duration cap, and restarts the span") {
    // key 1: events at 0, 10, 20, 100 (gap 50 splits), then a chain
    // 100..160 in steps of 20 crossing the 50-duration cap
    val ts = Seq(0L, 10L, 20L, 100L, 120L, 140L, 160L)
    val rows = ts.zipWithIndex.map { case (t, i) => (1L, i.toLong, t) }
    val got = StatefulScan.cappedSessions(rows.toDF("k", "id", "ts"),
        "k", "id", "ts", gapUs = 50L, maxDurUs = 50L)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (_, id, _, ord) => id -> ord }.toMap
    // 0,10,20 → session 1; 100 → 2 (gap); 120,140 extend (span 40);
    // 160 → 3 (span 60 > 50 cap)
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 2L,
      4L -> 2L, 5L -> 2L, 6L -> 3L), got.toString)
  }

  test("cappedSessions with huge caps degenerates to one session per key") {
    val rows = (0L until 100L).map(i => (i % 5, i, i * 1000L))
    val got = StatefulScan.cappedSessions(rows.toDF("k", "id", "ts"),
        "k", "id", "ts", gapUs = Long.MaxValue / 4, maxDurUs = Long.MaxValue / 4)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.forall(_._4 == 1L))
  }
}
