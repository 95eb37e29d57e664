package graft.llm

import graft.SparkSpec

/** Pins [[SetSimJoin.jaccardPairs]] against a brute-force all-pairs
  * reference: the prefix filter must be COMPLETE (no lost pair) and
  * the integer keep rule exact. */
class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(docs: Seq[(Long, String)], num: Int,
                    den: Int): Set[(Long, Long, Long, Long, Long)] = {
    val sets = docs.map { case (id, t) =>
      id -> t.toLowerCase.split(" ").filter(_.nonEmpty).toSet
    }.toMap
    (for {
      a <- sets.keys; b <- sets.keys if a < b
      i = (sets(a) & sets(b)).size
      if i * den >= (sets(a).size + sets(b).size - i) * num
    } yield (a, b, i.toLong, sets(a).size.toLong, sets(b).size.toLong)).toSet
  }

  private def run(docs: Seq[(Long, String)], num: Int,
                  den: Int): Set[(Long, Long, Long, Long, Long)] =
    SetSimJoin.jaccardPairs(docs.toDF("id", "text"), "id", "text", num, den)
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  private val corpus = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "the quick brown fox leaps over the lazy dog",
    3L -> "a quick brown fox jumps over a lazy dog",
    4L -> "entirely different words appear here tonight",
    5L -> "entirely different words appear here tonight too",
    6L -> "the quick brown fox jumps over the lazy dog", // exact dup of 1
    7L -> "one two three",
    8L -> "three four five six seven eight nine ten")

  test("matches brute force at t = 1/2") {
    assert(run(corpus, 1, 2) == brute(corpus, 1, 2))
    assert(run(corpus, 1, 2).nonEmpty)
  }

  test("matches brute force at t = 4/5 (tight) and t = 1/4 (loose)") {
    assert(run(corpus, 4, 5) == brute(corpus, 4, 5))
    assert(run(corpus, 1, 4) == brute(corpus, 1, 4))
  }

  test("t = 1 keeps exactly the identical token sets") {
    val got = run(corpus, 1, 1)
    assert(got == brute(corpus, 1, 1))
    assert(got.map(p => (p._1, p._2)) == Set((1L, 6L)))
  }

  test("duplicate tokens and case fold before set semantics") {
    val docs = Seq(1L -> "A a A b", 2L -> "b a", 3L -> "b c")
    // doc1 tokens {a, b} == doc2 tokens {a, b}; doc3 shares 1 of 2
    val got = run(docs, 1, 2)
    assert(got == brute(docs, 1, 2))
    assert(got.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 2L))
  }

  test("threshold validation is loud") {
    intercept[IllegalArgumentException] {
      SetSimJoin.jaccardPairs(corpus.toDF("id", "text"), "id", "text", 3, 2)
    }
  }

  test("ngram=3 agrees with Dedup.ngramJaccardPairs on the fixture sample") {
    import org.apache.spark.sql.functions.col
    val docs = graft.core.Tables.documents(spark, sf).limit(200)
    val viaPrefix = SetSimJoin
      .jaccardPairs(docs, "doc_id", "text", 1, 2, ngram = 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val viaPostings = Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, dfCap = 1000000)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(viaPrefix == viaPostings)
    assert(viaPrefix.nonEmpty)
  }
}
