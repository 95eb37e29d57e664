package graft.ops

import graft.SparkSpec

/** Pins [[FuzzyJoin.pairs]]: the distance predicate, the blocking
  * trade-off (leading-char typos are not reported), distinct-value
  * dedup, and null handling. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("finds pairs within maxDist, ordered n1 < n2, with distances") {
    val df = Seq("kitten", "sitten", "kitchen", "mitten", "kittens").toDF("n")
    val got = FuzzyJoin.pairs(df, "n", maxDist = 2)
      .as[(String, String, Long)].collect().toSet
    // blocked on first char: kitten–kitchen (2), kitten–kittens (1);
    // sitten/mitten differ from kitten in char 1 → different blocks
    assert(got == Set(("kitchen", "kitten", 2L), ("kitten", "kittens", 1L)), got.toString)
  }

  test("wider block prefix tightens blocks; equal values never pair") {
    val df = Seq("abcd", "abce", "azzz", "abcd").toDF("n") // duplicate abcd
    val got2 = FuzzyJoin.pairs(df, "n", maxDist = 3, blockPrefix = 2)
      .as[(String, String, Long)].collect().toSet
    assert(got2 == Set(("abcd", "abce", 1L)), got2.toString) // azzz blocked out by "az"
    val got1 = FuzzyJoin.pairs(df, "n", maxDist = 3, blockPrefix = 1)
      .as[(String, String, Long)].collect().toSet
    assert(got1 == Set(("abcd", "abce", 1L), ("abcd", "azzz", 3L), ("abce", "azzz", 3L)),
      got1.toString)
  }

  test("nulls are dropped; empty input yields empty output") {
    val df = Seq(Some("ab"), None, Some("ac")).toDF("n")
    val got = FuzzyJoin.pairs(df, "n", 1).as[(String, String, Long)].collect().toSet
    assert(got == Set(("ab", "ac", 1L)), got.toString)
    assert(FuzzyJoin.pairs(Seq.empty[String].toDF("n"), "n", 1).count() == 0L)
  }
}
