package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[CountMin]]'s three contracts: the one-sided error guarantee
  * (estimates never undercount), shard mergeability (sketch of the
  * union == cellwise sum of shard sketches), and the bounded size
  * (≤ d·w cells regardless of input). */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val keys: Seq[String] =
    (1 to 400).map(i => s"k${i % 97}") ++ Seq.fill(50)("hot") ++
      (1 to 30).map(i => s"rare$i")

  test("estimates never undercount, exact for collision-free keys") {
    val df = keys.toDF("k")
    val cms = CountMin.sketch(df, "k", d = 4, w = 64)
    val exact = df.groupBy("k").agg(count(lit(1)).as("exact"))
    val est = CountMin.estimate(cms, exact, "k", d = 4, w = 64)
      .select(col("k"), col("exact"), col("est"))
      .as[(String, Long, Long)].collect()
    assert(est.length == keys.distinct.length)
    est.foreach { case (k, ex, e) =>
      assert(e >= ex, s"undercount for $k: est=$e < exact=$ex")
    }
    // the hot key's estimate is within the CM bound with high margin
    // at this tiny scale: collisions can add at most the co-located
    // keys' mass; sanity-bound it by the total row count
    val hot = est.find(_._1 == "hot").get
    assert(hot._3 <= keys.size)
  }

  test("two shard sketches merge to the full-data sketch, cell for cell") {
    val (a, b) = keys.splitAt(keys.length / 3)
    val full = CountMin.sketch(keys.toDF("k"), "k", d = 4, w = 32)
    val merged = CountMin.merge(
      CountMin.sketch(a.toDF("k"), "k", d = 4, w = 32),
      CountMin.sketch(b.toDF("k"), "k", d = 4, w = 32))
    val f = full.as[(Long, Long, Long)].collect().toSet
    val m = merged.as[(Long, Long, Long)].collect().toSet
    assert(f == m)
  }

  test("sketch size is bounded by d*w however large the input") {
    val big = (1L to 20000L).map(i => s"u$i").toDF("k")
    val n = CountMin.sketch(big, "k", d = 3, w = 16).count()
    assert(n <= 3 * 16, s"sketch has $n cells > d*w")
  }

  test("invalid dimensions fail loudly") {
    val e = intercept[IllegalArgumentException] {
      CountMin.sketch(Seq("x").toDF("k"), "k", d = 0, w = 64)
    }
    assert(e.getMessage.contains("count-min"))
  }
}
