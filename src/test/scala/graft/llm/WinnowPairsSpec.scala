package graft.llm

import graft.SparkSpec

/** Pins [[Dedup.winnowPairs]]: a planted shared passage links exactly
  * its two documents, and the dfCap fence drops corpus-wide
  * boilerplate fingerprints before the self-join squares them. */
class WinnowPairsSpec extends SparkSpec {
  import spark.implicits._

  test("documents sharing a long passage pair up; unrelated ones do not") {
    val passage = "the stolen paragraph that appears verbatim in both documents"
    val df = Seq(
      (1L, s"intro text before $passage and some closing words"),
      (2L, s"a different beginning $passage with another ending"),
      (3L, "entirely original writing with no copied fragments anywhere")
    ).toDF("id", "text")
    val got = Dedup.winnowPairs(df, "id", "text", minShared = 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)), got.toString)
  }

  test("dfCap fences boilerplate fingerprints out of the self-join") {
    // every doc carries the same boilerplate; only two share a passage
    val boiler = "standard legal disclaimer attached to every single document"
    val passage = "genuinely duplicated content fragment"
    val df = Seq(
      (1L, s"$boiler alpha body $passage"),
      (2L, s"$boiler beta content $passage"),
      (3L, s"$boiler gamma words entirely different"),
      (4L, s"$boiler delta prose also unique here")
    ).toDF("id", "text")
    // cap 3 < 4 docs: boilerplate fps (df=4) are fenced, passage fps
    // (df=2) survive — only the true pair remains
    val got = Dedup.winnowPairs(df, "id", "text", minShared = 2, dfCap = 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)), got.toString)
  }
}
