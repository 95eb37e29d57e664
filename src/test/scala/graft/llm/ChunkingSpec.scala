package graft.llm

import graft.SparkSpec

/** Pins [[Chunking.chunkTokens]]: window stepping with overlap, the
  * short last window, single-chunk and empty documents, and full
  * token coverage. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def chunks(text: String, maxTokens: Int, overlap: Int): Seq[(Long, Long, String)] =
    Chunking.chunkTokens(Seq((1L, text)).toDF("id", "text"), "id", "text", maxTokens, overlap)
      .select("chunk_id", "n_tok", "chunk").as[(Long, Long, String)]
      .collect().sortBy(_._1).toSeq

  test("overlapping windows step by maxTokens - overlap; last is short") {
    val got = chunks("a b c d e f g h i j", maxTokens = 8, overlap = 2)
    assert(got == Seq(
      (0L, 8L, "a b c d e f g h"),
      (1L, 4L, "g h i j")), got.toString)
  }

  test("doc within budget yields one chunk; empty doc yields none") {
    assert(chunks("a b c", 8, 2) == Seq((0L, 3L, "a b c")))
    assert(chunks("", 8, 2).isEmpty)
    assert(chunks("   ", 8, 2).isEmpty)
  }

  test("zero overlap partitions exactly; every token covered once") {
    val got = chunks((1 to 25).map(i => s"t$i").mkString(" "), maxTokens = 10, overlap = 0)
    assert(got.map(_._2) == Seq(10L, 10L, 5L))
    assert(got.flatMap(_._3.split(" ")) == (1 to 25).map(i => s"t$i"))
  }

  test("every token appears in some chunk with overlap too") {
    val toks = (1 to 53).map(i => s"w$i")
    val got = chunks(toks.mkString(" "), maxTokens = 16, overlap = 5)
    assert(got.flatMap(_._3.split(" ")).toSet == toks.toSet)
    // consecutive chunks share exactly `overlap` tokens while full
    got.sliding(2).foreach {
      case Seq((_, n1, c1), (_, _, c2)) if n1 == 16 =>
        assert(c1.split(" ").takeRight(5).toSeq == c2.split(" ").take(5).toSeq)
      case _ =>
    }
    assert(got.last._2 <= 16)
  }

  test("guards: bad maxTokens/overlap fail loudly") {
    val df = Seq((1L, "a b")).toDF("id", "text")
    intercept[IllegalArgumentException](Chunking.chunkTokens(df, "id", "text", 0))
    intercept[IllegalArgumentException](Chunking.chunkTokens(df, "id", "text", 8, 8))
  }
}
