package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[ZValue]]: hand-computed interleaves, the differential
  * reference, clamping, nulls, and the locality property that makes
  * z-layout worth a sort. */
class ZValueSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed 2-D interleave: (x=0b101, y=0b011) -> " +
       "y1x1 y0x0 pairs from the low bit up") {
    // bit (b*2 + 0) = x_b, bit (b*2 + 1) = y_b
    // x=5 (101), y=3 (011): z = x0 + 2*y0 + 4*x1 + 8*y1 + 16*x2 + 32*y2
    //   = 1 + 2 + 0 + 8 + 16 + 0 = 27
    assert(ZValue.ref(Seq(5L, 3L), 3) == 27L)
    // 3-D: (1, 1, 1) with 1 bit each -> 0b111 = 7
    assert(ZValue.ref(Seq(1L, 1L, 1L), 1) == 7L)
  }

  test("expression agrees with the reference over random inputs; " +
       "negatives clamp to 0, oversized values clamp to the mask") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 200).map { _ =>
      (rnd.nextLong() % 2000, rnd.nextLong() % 2000)
    }
    val got = rows.toDF("x", "y")
      .select(ZValue(array(col("x"), col("y")), 8).as("z"))
      .as[Long].collect()
    rows.zip(got).foreach { case ((x, y), z) =>
      assert(z == ZValue.ref(Seq(x, y), 8), s"x=$x y=$y")
    }
  }

  test("null element reads as 0; null array is null") {
    val df = Seq((Some(3L), Some(2L)), (None, Some(2L))).toDF("x", "y")
    val z = df.select(ZValue(array(col("x"), col("y")), 4).as("z"))
      .as[Long].collect()
    assert(z(0) == ZValue.ref(Seq(3L, 2L), 4))
    assert(z(1) == ZValue.ref(Seq(0L, 2L), 4))
    val nz = Seq(1).toDF("k")
      .select(ZValue(lit(null).cast("array<bigint>"), 4).as("z"))
      .collect()
    assert(nz(0).isNullAt(0))
  }

  test("locality: a z-range bucket bounds BOTH dimensions (the data- " +
       "skipping property a lexicographic sort only gives the first)") {
    // full 6-bit grid, bucket by the top 2 z bits -> each bucket is
    // one 4x4 quadrant: both dims span < the full 8 range in EVERY
    // bucket; a lexicographic (x,y) sort bounds only x.
    val grid = for (x <- 0 until 8; y <- 0 until 8) yield (x.toLong, y.toLong)
    val buckets = grid.toDF("x", "y")
      .select(col("x"), col("y"),
        (ZValue(array(col("x"), col("y")), 3) / 16).cast("long").as("bkt"))
      .groupBy("bkt")
      .agg(max(col("x")) - min(col("x")), max(col("y")) - min(col("y")))
      .as[(Long, Long, Long)].collect()
    assert(buckets.length == 4)
    buckets.foreach { case (_, xs, ys) => assert(xs == 3 && ys == 3) }
  }
}
