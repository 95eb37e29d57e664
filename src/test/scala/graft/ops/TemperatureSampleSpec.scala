package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Sampling.temperatureSample]]: the sqrt-weight quota rule,
  * the per-stratum cap, determinism under physical reordering, and
  * the degenerate targets. */
class TemperatureSampleSpec extends SparkSpec {
  import spark.implicits._

  // strata sizes 9 / 4 / 1 → sqrt weights 3 / 2 / 1, W = 6
  private def corpus = {
    val rows =
      (1 to 9).map(i => (i.toLong, "x")) ++
        (10 to 13).map(i => (i.toLong, "y")) ++
        Seq((14L, "z"))
    rows.toDF("id", "s")
  }

  test("quotas follow T*w/W exactly") {
    // T=6: x gets 6*3/6=3, y 6*2/6=2, z 6*1/6=1
    val got = Sampling.temperatureSample(corpus, "s", col("id"), 6L)
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(got == Map("x" -> 3L, "y" -> 2L, "z" -> 1L), got.toString)
  }

  test("quota never exceeds the stratum count") {
    // T=60: raw quotas 30/20/10 all cap at the stratum sizes
    val got = Sampling.temperatureSample(corpus, "s", col("id"), 60L)
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(got == Map("x" -> 9L, "y" -> 4L, "z" -> 1L), got.toString)
  }

  test("membership is content-stable: repartitioned input picks the same ids") {
    val a = Sampling.temperatureSample(corpus, "s", col("id"), 6L)
      .select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.temperatureSample(corpus.repartition(7).sortWithinPartitions(desc("id")),
        "s", col("id"), 6L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b && a.size == 6, s"$a vs $b")
  }

  test("target 0 selects nothing; schema is the input schema") {
    val got = Sampling.temperatureSample(corpus, "s", col("id"), 0L)
    assert(got.columns.toSeq == Seq("id", "s"))
    assert(got.count() == 0L)
  }

  test("null strata rows are kept and quota'd as their own stratum") {
    val withNull = corpus.union(Seq((20L, null.asInstanceOf[String]),
      (21L, null.asInstanceOf[String])).toDF("id", "s"))
    // sizes 9/4/1/2 → weights 3/2/1/1, W=7; T=7 → quotas 3/2/1/1
    val got = Sampling.temperatureSample(withNull, "s", col("id"), 7L)
    assert(got.where(col("s").isNull).count() == 1L)
    assert(got.count() == 7L)
  }
}
