package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Mixing.epochPlan]]: the integer ceil repeat rule, the
  * maxRepeat cap, zero-weight drops, default weights, and complete
  * 0..r-1 replica indices. */
class MixingSpec extends SparkSpec {
  import spark.implicits._

  // A: 4 docs, B: 2 docs
  private def corpus =
    ((1 to 4).map(i => (i.toLong, "A")) ++ (5 to 6).map(i => (i.toLong, "B")))
      .toDF("id", "src")

  test("ceil repeat factors: T=8, w(A)=3, w(B)=1") {
    // W=4; r_A = ceil(8*3/(4*4)) = 2, r_B = ceil(8*1/(4*2)) = 1
    val got = Mixing.epochPlan(corpus, "src", Map("A" -> 3L, "B" -> 1L), targetTotal = 8L)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(got == Map("A" -> 8L, "B" -> 2L), got.toString)
  }

  test("replica indices are complete 0..r-1 per document") {
    val got = Mixing.epochPlan(corpus, "src", Map("A" -> 3L), targetTotal = 8L)
      .groupBy("id").agg(sort_array(collect_list("replica")).as("rs"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got(1L) == Seq(0L, 1L) && got(5L) == Seq(0L))
  }

  test("maxRepeat caps a tiny high-weight source") {
    val got = Mixing.epochPlan(corpus, "src", Map("B" -> 100L), targetTotal = 100L,
        maxRepeat = 3L).groupBy("src").count().as[(String, Long)].collect().toMap
    assert(got("B") == 6L, got.toString) // 2 docs x cap 3, not x ceil(...)
  }

  test("weight 0 drops the source; absent sources use defaultWeight") {
    val got = Mixing.epochPlan(corpus, "src", Map("A" -> 0L), targetTotal = 6L)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    // W = 0 + 1(default for B) = 1; r_B = ceil(6*1/(1*2)) = 3
    assert(got == Map("B" -> 6L), got.toString)
  }

  test("schema is input columns plus replica; deterministic under repartition") {
    val a = Mixing.epochPlan(corpus, "src", Map("A" -> 3L), 8L)
    assert(a.columns.toSeq == Seq("id", "src", "replica"))
    val x = a.as[(Long, String, Long)].collect().sorted.toSeq
    val y = Mixing.epochPlan(corpus.repartition(5), "src", Map("A" -> 3L), 8L)
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(x == y)
  }
}
