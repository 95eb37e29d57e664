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

  test("semanticFlags with an empty eval set keeps every corpus row clean") {
    // The crossJoin against zero eval rows must NOT erase the corpus:
    // the left-join posture reports every id with max_sim 0.0 / clean.
    val corpus = Seq((1L, Array(1.0, 0.0)), (2L, Array(0.0, 1.0)))
      .toDF("id", "vec")
    val emptyEval = Seq.empty[(Long, Array[Double])].toDF("id", "vec")
    val got = Decontamination.semanticFlags(corpus, emptyEval, "id", "vec", 0.9)
      .as[(Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 0.0, false), (2L, 0.0, false)))
    // and a NON-empty eval still flags the matching vector
    val hit = Decontamination.semanticFlags(corpus,
        Seq((9L, Array(1.0, 0.0))).toDF("id", "vec"), "id", "vec", 0.9)
      .as[(Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    assert(hit == Seq((1L, 1.0, true), (2L, 0.0, false)))
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
