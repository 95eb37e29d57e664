package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Decontamination.overlapFlagsBloom]]: bit-identical results
  * to the exact path (the filter changes the plan, not the answer),
  * the might_contain prefilter actually in the executed plan, and a
  * clean-corpus all-zeros case. */
class BloomDecontamSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("bloom path equals exact path on the fixture corpus") {
    val train = docsDf.where(col("doc_id") % 5 =!= 0)
    val eval0 = docsDf.where(col("doc_id") % 5 === 0)
    val exact = Decontamination.overlapFlags(train, eval0, "doc_id", "text", n = 3)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val bloom = Decontamination.overlapFlagsBloom(train, eval0, "doc_id", "text", n = 3,
        expectedGrams = 1L << 14)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(bloom == exact)
    assert(exact.nonEmpty && exact.exists(_._3), "fixture should contain real overlap")
  }

  test("the executed plan carries the might_contain prefilter") {
    val train = Seq((1L, "p q r s")).toDF("doc_id", "text")
    val eval0 = Seq((9L, "x y z w")).toDF("doc_id", "text")
    val df = Decontamination.overlapFlagsBloom(train, eval0, "doc_id", "text", n = 2)
    assert(df.queryExecution.executedPlan.toString.contains("might_contain"),
      df.queryExecution.executedPlan.toString.take(2000))
  }

  test("disjoint corpora: every train doc clean, none dropped") {
    val train = Seq((1L, "p q r s"), (2L, "s t u v")).toDF("doc_id", "text")
    val eval0 = Seq((9L, "x y z w")).toDF("doc_id", "text")
    val got = Decontamination.overlapFlagsBloom(train, eval0, "doc_id", "text", n = 2)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 0L, false), (2L, 0L, false)), got.toString)
  }

  test("bad sizing parameters fail fast") {
    val d = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Decontamination.overlapFlagsBloom(d, d, "doc_id", "text", n = 2, fpp = 1.5)
    }
    intercept[IllegalArgumentException] {
      Decontamination.overlapFlagsBloom(d, d, "doc_id", "text", n = 2, expectedGrams = 0)
    }
  }
}
