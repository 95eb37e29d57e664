package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[UnigramLM.raritySignals]]: the hand-computed bit-length
  * rarity rule, zero-token documents, broadcast/shuffle vocab parity,
  * and the duplicate-id contract. */
class UnigramLMSpec extends SparkSpec {
  import spark.implicits._

  // corpus: a:2 b:2 c:1, total 5 occurrences
  //   rarity(a) = len(bin(5 div 2 = 2)) - 1 = 1; rarity(b) = 1
  //   rarity(c) = len(bin(5 div 1 = 5)) - 1 = 2
  private def corpus = Seq(
    (1L, "a a b"),   // 3 tokens, sum 1+1+1 = 3, avg 1.0
    (2L, "b c"),     // 2 tokens, sum 1+2 = 3, avg 1.5
    (3L, "")         // zero tokens — must survive with nulls/zeros
  ).toDF("id", "text")

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "n_tok", "rarity_sum", "rarity_avg")
      .as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1).toSeq

  test("hand-computed rarity on a three-doc corpus") {
    val got = collect(UnigramLM.raritySignals(corpus, "id", "text"))
    assert(got == Seq(
      (1L, 3L, 3L, Some(1.0)),
      (2L, 2L, 3L, Some(1.5)),
      (3L, 0L, 0L, None)), got.toString)
  }

  test("broadcast and shuffle vocab paths agree") {
    val a = collect(UnigramLM.raritySignals(corpus, "id", "text", broadcastVocab = false))
    val b = collect(UnigramLM.raritySignals(corpus, "id", "text", broadcastVocab = true))
    assert(a == b)
  }

  test("case folding: tokens are lowercased before counting") {
    val got = collect(UnigramLM.raritySignals(
      Seq((1L, "A a"), (2L, "a")).toDF("id", "text"), "id", "text"))
    // one token 'a' with count 3, total 3: rarity = len(bin(1))-1 = 0
    assert(got == Seq((1L, 2L, 0L, Some(0.0)), (2L, 1L, 0L, Some(0.0))), got.toString)
  }

  test("duplicate ids fail loudly") {
    val e = intercept[Exception] {
      // collect(), not count(): a count would let the optimizer prune
      // the raise_error projection away with the rest of the columns
      UnigramLM.raritySignals(
        Seq((1L, "a"), (1L, "b")).toDF("id", "text"), "id", "text").collect()
    }
    assert(e.getMessage.contains("duplicate") || e.getCause != null)
  }
}
