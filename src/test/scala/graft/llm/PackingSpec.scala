package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins [[Packing.packSequences]]: stripe assignment from the
  * exclusive prefix sum, never splitting a document, and — the point
  * of the two-phase scan — identical output at any partition count,
  * matched against the single-partition window definition.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("pack_id is the budget stripe of each document's start offset") {
    val df = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 4L)).toDF("id", "n_tok")
    val got = Packing.packSequences(df, "id", "n_tok", budget = 10, numPartitions = 2)
      .select("id", "pack_id").as[(Long, Long)].collect().toMap
    // starts 0,4,8,12 -> stripes 0,0,0,1
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L), got.toString)
  }

  test("a document larger than the budget gets its own stripe run, unsplit") {
    val df = Seq((1L, 3L), (2L, 25L), (3L, 3L)).toDF("id", "n_tok")
    val got = Packing.packSequences(df, "id", "n_tok", budget = 10, numPartitions = 3)
      .select("id", "pack_id").as[(Long, Long)].collect().toMap
    // starts 0,3,28 -> stripes 0,0,2: the oversize doc lands in ONE
    // pack (overflowing it) and pushes the next doc past stripe 1
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 2L), got.toString)
  }

  test("partition count never changes the assignment (two-phase scan parity)") {
    val docs = (1L to 500L).map(i => (i, (i * 7 % 23) + 1)) // 1..23 tokens
    val df = docs.toDF("id", "n_tok")
    val oracle = df
      .withColumn("cum", sum("n_tok").over(Window.orderBy("id")))
      .select(col("id"), ((col("cum") - col("n_tok")) / lit(64L)).cast("long").as("pack_id"))
      .as[(Long, Long)].collect().toMap
    for (parts <- Seq(1, 3, 8, 64)) {
      val got = Packing.packSequences(df, "id", "n_tok", budget = 64, numPartitions = parts)
        .select("id", "pack_id").as[(Long, Long)].collect().toMap
      assert(got == oracle, s"parts=$parts diverged from the window definition")
    }
  }

  test("string order keys walk in lexicographic order") {
    val df = Seq(("b", 6L), ("a", 6L), ("c", 6L)).toDF("id", "n_tok")
    val got = Packing.packSequences(df, "id", "n_tok", budget = 10, numPartitions = 2)
      .select("id", "pack_id").as[(String, Long)].collect().toMap
    // walk a(0), b(6), c(12) -> stripes 0, 0, 1
    assert(got == Map("a" -> 0L, "b" -> 0L, "c" -> 1L), got.toString)
  }

  test("duplicate order keys fail loudly instead of packing nondeterministically") {
    val df = Seq((1L, 4L), (1L, 5L), (2L, 6L)).toDF("id", "n_tok")
    val err = intercept[org.apache.spark.SparkException] {
      Packing.packSequences(df, "id", "n_tok", budget = 10, numPartitions = 2)
    }
    assert(err.getMessage.contains("duplicate")
      || Option(err.getCause).exists(_.getMessage.contains("duplicate")))
  }

  test("int token columns work; negative counts fail loudly") {
    val ok = Packing.packSequences(
      Seq((1L, 5), (2L, 6)).toDF("id", "n_tok"), "id", "n_tok", budget = 8)
      .select("id", "pack_id").as[(Long, Long)].collect().toMap
    assert(ok == Map(1L -> 0L, 2L -> 0L))
    val bad = intercept[org.apache.spark.SparkException] {
      Packing.packSequences(
        Seq((1L, -3)).toDF("id", "n_tok"), "id", "n_tok", budget = 8).collect()
    }
    assert(bad.getMessage.contains("negative token count")
      || Option(bad.getCause).exists(_.getMessage.contains("negative token count")))
  }
}
