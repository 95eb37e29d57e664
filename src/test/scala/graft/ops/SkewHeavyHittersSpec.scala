package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Skew.report]] (integer ppm/bp math, top-N ordering) and
  * [[HeavyHitters.exactOverThreshold]] (exact answer regardless of
  * sketch pressure, null keys, empty results). */
class SkewHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("skew report: integer shares and multiples of mean") {
    // 10 rows over 3 keys: a=6, b=3, c=1 → total 10, nkeys 3
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val got = Skew.report(df, "k", 10)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 6L, 600000L, 18000L), // 6/10 = 600000 ppm; 6*3*10000/10 = 18000 bp
      ("b", 3L, 300000L, 9000L),
      ("c", 1L, 100000L, 3000L)), got.toString)
  }

  test("skew report: topN truncates after count-desc/key ordering") {
    val df = (Seq.fill(5)("z") ++ Seq.fill(5)("y") ++ Seq("x")).toDF("k")
    val got = Skew.report(df, "k", 2).select("k").as[String].collect().toSeq
    assert(got == Seq("y", "z"), got.toString) // ties broken by key asc
  }

  test("heavy hitters: exact set {key | cnt*k > n} under sketch pressure") {
    // 60 distinct light keys + two heavies; k=10 forces constant
    // summary evictions, but the heavies must survive by the MG bound
    val rows = (1 to 60).map(i => s"light$i") ++
      Seq.fill(30)("heavy1") ++ Seq.fill(20)("heavy2")
    val df = rows.toDF("k").repartition(7)
    val n = rows.size // 110; threshold n/k = 11
    val got = HeavyHitters.exactOverThreshold(df, "k", 10)
      .as[(String, Long)].collect().sortBy(-_._2).toSeq
    assert(got == Seq(("heavy1", 30L), ("heavy2", 20L)), got.toString)
    assert(got.forall(_._2 * 10 > n))
  }

  test("heavy hitters: exact counts match a plain groupBy") {
    val df = spark.read.parquet(s"$sf/orders.parquet").select(col("o_orderpriority"))
    val expected = df.groupBy("o_orderpriority").count()
      .withColumn("total", sum("count").over())
      .where(col("count") * 3 > col("total"))
      .select(col("o_orderpriority"), col("count"))
      .as[(String, Long)].collect().toMap
    val got = HeavyHitters.exactOverThreshold(df, "o_orderpriority", 3)
      .as[(String, Long)].collect().toMap
    assert(got == expected, s"$got vs $expected")
  }

  test("heavy hitters: null keys tracked and reported as null") {
    val df = (Seq.fill(5)(Some("a")) ++ Seq.fill(4)(None) ++ Seq(Some("b"))).toDF("k")
    val got = HeavyHitters.exactOverThreshold(df, "k", 3)
      .as[(Option[String], Long)].collect().toSet
    assert(got == Set((Some("a"), 5L), (None, 4L)), got.toString)
  }

  test("heavy hitters: no key over threshold yields empty frame with schema") {
    val df = (1 to 20).map(i => s"k$i").toDF("k") // all counts 1, k=5 → need > 4
    val got = HeavyHitters.exactOverThreshold(df, "k", 5)
    assert(got.columns.toSeq == Seq("k", "cnt"))
    assert(got.count() == 0L)
  }
}
