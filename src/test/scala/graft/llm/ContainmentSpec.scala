package graft.llm

import graft.SparkSpec

/** [[Dedup.containmentPairs]] — asymmetric sub-document duplication. */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  // doc 2 is a strict prefix of doc 1 (full containment one way only);
  // doc 3 is unrelated
  private def docs = Seq(
    (1L, "a b c d e f g h i j k l"),
    (2L, "a b c d e f"),
    (3L, "z y x w v u t s r q")).toDF("doc_id", "text")

  test("a contained doc scores 1.0 toward its container, not back") {
    val got = Dedup.containmentPairs(docs, "doc_id", "text", 3, 90)
      .as[(Long, Long, Double)].collect().toSet
    // doc 2 has 4 trigrams, all present in doc 1 → containment 1.0;
    // doc 1 has 10 trigrams, only 4 shared → 0.4, below 90%
    assert(got == Set((2L, 1L, 1.0)), got.toString)
  }

  test("symmetric jaccard dilutes what containment catches") {
    val j = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.9)
      .collect()
    assert(j.isEmpty) // jaccard(1,2) = 4/10 — invisible at 0.9
  }

  test("lowering the threshold surfaces the reverse direction") {
    val got = Dedup.containmentPairs(docs, "doc_id", "text", 3, 40)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((2L, 1L, 1.0), (1L, 2L, 0.4)), got.toString)
  }

  test("dfCap fences boilerplate grams out of both directions") {
    // a gram shared by every doc is fenced at dfCap 2 — doc 2's
    // remaining grams still sit inside doc 1
    val d = Seq(
      (1L, "common gram here a b c d e"),
      (2L, "common gram here a b c"),
      (3L, "common gram here q r s t")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(d, "doc_id", "text", 3, 90, dfCap = 2)
      .as[(Long, Long, Double)].collect().toSet
    // with "common gram here" fenced, doc2 keeps grams over
    // "here a b c" minus fenced ones — all inside doc1
    assert(got.exists { case (s, p, c) => s == 2L && p == 1L && c == 1.0 }, got.toString)
  }
}
