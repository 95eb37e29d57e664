package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the two web-scale fan-out guards in [[Dedup]]:
  *  - the shingle document-frequency cap (`dfCap`) that keeps one
  *    boilerplate gram from turning the gram self-join quadratic, and
  *  - the band-bucket size cap (`maxBucketSize`) that does the same for
  *    LSH buckets.
  * Both must (a) kick in on a hot corpus and (b) leave results
  * untouched on a corpus where nothing crosses the cap.
  */
class DedupCapSpec extends SparkSpec {
  import spark.implicits._

  // every doc opens with the same 3 words (one corpus-wide hot
  // shingle), then diverges into doc-unique vocabulary
  private lazy val hotCorpus = (0 until 40).map { i =>
    (i.toLong, s"all rights reserved alpha$i beta$i gamma$i delta$i")
  }.toDF("doc_id", "text")

  test("dfCap drops the corpus-wide hot shingle from the pair space") {
    // cap below the hot gram's DF (40): the only shared shingle is
    // dropped from intersection AND union, so no pair shares anything
    val capped = Dedup.ngramJaccardPairs(hotCorpus, "doc_id", "text",
      n = 3, threshold = 0.01, dfCap = 10)
    assert(capped.count() == 0, "hot shingle must not generate pairs under the cap")
    // without the cap the hot shingle alone pairs every doc with every
    // other — the quadratic shape the cap exists to prevent
    val uncapped = Dedup.ngramJaccardPairs(hotCorpus, "doc_id", "text",
      n = 3, threshold = 0.01, dfCap = Dedup.DefaultDfCap)
    assert(uncapped.count() == 40L * 39 / 2)
  }

  test("dfCap leaves results bit-identical when no shingle crosses it") {
    val docs = (0 until 12).map { i =>
      // pairs (2k, 2k+1) are near-duplicates; every trigram contains a
      // pair-specific token, so no shingle's DF exceeds 2 (= the cap)
      val k = i / 2
      (i.toLong, s"alpha$k beta$k gamma$k delta$k epsilon$k marker$i")
    }.toDF("doc_id", "text")
    val loose = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.3, Dedup.DefaultDfCap)
      .orderBy("id1", "id2").collect().toSeq
    val tight = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.3, dfCap = 2)
      .orderBy("id1", "id2").collect().toSeq
    assert(loose.nonEmpty, "fixture must produce pairs")
    assert(loose == tight)
  }

  test("maxBucketSize excludes oversized LSH band buckets from the pair join") {
    // 30 identical docs: every band bucket holds all 30 signatures
    val clones = (0 until 30).map(i => (i.toLong, "identical boilerplate page footer text here"))
      .toDF("doc_id", "text")
    val sigs = Dedup.signatures(clones, "doc_id", "text", 3).persist()
    try {
      val capped = Dedup.candidatesFromSignatures(sigs, minEst = 0.1, maxBucketSize = 10)
      assert(capped.count() == 0, "every bucket is over the cap — no pairwise join")
      val uncapped = Dedup.candidatesFromSignatures(sigs, minEst = 0.1)
      assert(uncapped.count() == 30L * 29 / 2)
    } finally sigs.unpersist()
  }

  test("a pair in one hot bucket still surfaces through its other bands") {
    // two distinct near-dup docs + 20 clones of an unrelated page: the
    // clones blow past the cap in THEIR buckets, but the near-dup
    // pair's buckets stay small and keep matching
    val docs = ((0 until 20).map(i => (i.toLong, "identical boilerplate page footer text here")) ++ Seq(
      (100L, "completely different article about spark partitioning strategies and shuffles"),
      (101L, "completely different article about spark partitioning strategies and shuffling"))).toDF("doc_id", "text")
    val sigs = Dedup.signatures(docs, "doc_id", "text", 3).persist()
    try {
      val pairs = Dedup.candidatesFromSignatures(sigs, minEst = 0.3, maxBucketSize = 10)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      assert(pairs.contains((100L, 101L)),
        s"near-dup pair lost to an unrelated hot bucket: $pairs")
      assert(pairs.forall { case (a, b) => a >= 100L && b >= 100L },
        s"capped clone bucket leaked pairs: $pairs")
    } finally sigs.unpersist()
  }

  test("exactGroups caps the materialized id list but keeps the exact count") {
    val docs = ((0 until 250).map(i => (i.toLong, "same text")) :+ (999L, "different"))
      .toDF("doc_id", "text")
    val g = Dedup.exactGroups(docs, "doc_id", "text", maxIds = 100).collect()
    assert(g.length == 1)
    assert(g(0).getAs[Long]("c") == 250)
    val ids = g(0).getSeq[Long](g(0).fieldIndex("ids"))
    assert(ids.length == 100, s"id list must be capped at 100, got ${ids.length}")
    assert(ids == ids.sorted)
  }

  test("exactGroups returns the GLOBAL smallest ids with multiplicity across partitions") {
    // a hot key spread over many partitions, interleaved so each
    // partition's local smallest-N differs from the global answer, plus
    // a planted duplicate id (multiplicity must survive the cap)
    val rows = (0 until 200).map(i => (i.toLong, "dup text")) :+ (3L, "dup text")
    val docs = rows.toDF("doc_id", "text").repartition(7)
    val g = Dedup.exactGroups(docs, "doc_id", "text", maxIds = 10).collect()
    assert(g.length == 1 && g(0).getAs[Long]("c") == 201)
    val ids = g(0).getSeq[Long](g(0).fieldIndex("ids"))
    // global smallest 10 of {0,1,2,3,3,4,...}: the duplicate 3 is in
    assert(ids == Seq(0L, 1L, 2L, 3L, 3L, 4L, 5L, 6L, 7L, 8L), s"got $ids")
  }
}
