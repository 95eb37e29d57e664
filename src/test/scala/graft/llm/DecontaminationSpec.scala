package graft.llm

import graft.SparkSpec

/** Pins [[Decontamination.overlapFlags]]: distinct-gram counting,
  * clean docs kept with zero counts, broadcast and shuffle paths
  * agreeing, and the broadcast plan shape. */
class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    (1L, "the quick brown fox jumps"),     // shares "the quick brown" + "quick brown fox"
    (2L, "totally unrelated words here now"),
    (3L, "quick brown fox quick brown fox") // repeated gram counts ONCE
  ).toDF("id", "text")
  private val eval0 = Seq(
    (100L, "the quick brown fox"),
    (101L, "benchmark answer text")
  ).toDF("id", "text")

  test("overlap counts distinct shared grams; clean docs keep zero rows") {
    val got = Decontamination.overlapFlags(train, eval0, "id", "text", 3)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((2L, true)), got.toString)   // two shared 3-grams
    assert(got(2L) == ((0L, false)), "clean doc must appear with 0")
    assert(got(3L) == ((1L, true)), "repeated shared gram counts once")
  }

  test("empty eval corpus marks every train doc clean") {
    val got = Decontamination.overlapFlags(train,
      eval0.where($"id" < 0), "id", "text", 3)
      .as[(Long, Long, Boolean)].collect()
    assert(got.length == 3 && got.forall(r => r._2 == 0L && !r._3))
  }

  test("broadcast and shuffle paths agree; broadcast plans a BroadcastHashJoin") {
    val b = Decontamination.overlapFlags(train, eval0, "id", "text", 3)
    val s = Decontamination.overlapFlags(train, eval0, "id", "text", 3,
      broadcastEval = false)
    assert(b.as[(Long, Long, Boolean)].collect().toSet ==
      s.as[(Long, Long, Boolean)].collect().toSet)
    val plan = b.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
