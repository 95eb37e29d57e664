package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = graft.core.Tables.documents(spark, sf)

  test("exactGroups finds constructed duplicates") {
    val df = Seq((1L, "same text here"), (2L, "same  TEXT here"), (3L, "different"))
      .toDF("doc_id", "text")
    val groups = Dedup.exactGroups(df, "doc_id", "text").collect()
    assert(groups.length == 1 && groups(0).getAs[Long]("c") == 2L)
  }

  test("lineDedup scrubs cross-document boilerplate, keeps doc-local lines") {
    val df = Seq(
      (1L, "COOKIE BANNER\nreal content one\nLICENSE"),
      (2L, "COOKIE BANNER\nreal content two\nLICENSE"),
      (3L, "COOKIE BANNER\nunique paragraph\nLICENSE"),
      (4L, "COOKIE BANNER\nLICENSE"), // nothing survives
      (5L, "")).toDF("doc_id", "text") // empty in, empty out — still a row
    val out = Dedup.lineDedup(df, "doc_id", "text", maxDf = 2)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "real content one", 1L),
      (2L, "real content two", 1L),
      (3L, "unique paragraph", 1L),
      (4L, "", 0L),
      (5L, "", 0L)), out)
    // a line at exactly maxDf distinct docs survives (strictly-greater
    // cap), and multiplicity inside ONE doc does not inflate its df
    val df2 = Seq(
      (1L, "twice\ntwice\nown1"), (2L, "twice\nown2")).toDF("doc_id", "text")
    val out2 = Dedup.lineDedup(df2, "doc_id", "text", maxDf = 2)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out2 == Seq((1L, "twice\ntwice\nown1", 3L), (2L, "twice\nown2", 2L)), out2)
    // broadcast and shuffle anti-join paths agree
    val shuffled = Dedup.lineDedup(df, "doc_id", "text", maxDf = 2,
      broadcastCommon = false).as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(shuffled == out)
  }

  test("incremental near-dup vs the sketch index matches the one-shot cross pairs") {
    val tmp = java.nio.file.Files.createTempDirectory("sketch-idx").toString
    val hist = docs.where(col("doc_id") % 5 =!= 0)
    val nw = docs.where(col("doc_id") % 5 === 0)
    Dedup.writeSketchIndex(hist, "doc_id", "text", 3, s"$tmp/idx")
    val inc = Dedup.incrementalNearDups(nw, s"$tmp/idx", "doc_id", "text", 3, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    // ground truth: the full-corpus verified pairs, restricted to the
    // cross (new, hist) orientation in either order
    val full = Dedup.minHashVerifiedPairs(docs, "doc_id", "text", 3, 0.5)
      .as[(Long, Long, Double)].collect()
    val cross = full.flatMap { case (a, b, j) =>
      if (a % 5 == 0 && b % 5 != 0) Some((a, b, j))
      else if (b % 5 == 0 && a % 5 != 0) Some((b, a, j))
      else None
    }.toSet
    assert(inc == cross, s"incremental $inc vs one-shot cross $cross")
    // and the index write never re-reads history text on the query:
    // deduping a SECOND batch against the same stored index works
    val inc2 = Dedup.incrementalNearDups(nw.limit(10), s"$tmp/idx",
      "doc_id", "text", 3, 0.5).collect()
    assert(inc2.length <= inc.size)
    // a shingle-size mismatch with the stored index is refused loudly
    // (mismatched sketches would band-join into garbage silently)
    val e = intercept[IllegalArgumentException] {
      Dedup.incrementalNearDups(nw, s"$tmp/idx", "doc_id", "text", 5, 0.5)
    }
    assert(e.getMessage.contains("sketched with n=3"), e.getMessage)
  }

  test("fixture corpus has planted near-duplicates ≥ 0.8 Jaccard") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
    assert(exact.count() > 0)
  }

  test("minhash LSH candidates recover most exact near-dup pairs") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val cand = Dedup.minHashCandidates(docs, "doc_id", "text", 3, 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val recall = exact.count(cand.contains).toDouble / math.max(1, exact.size)
    assert(recall >= 0.8, s"minhash recall $recall over ${exact.size} pairs")
  }

  test("minhash estimate correlates with exact jaccard") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
    val cand = Dedup.minHashCandidates(docs, "doc_id", "text", 3, 0.5)
    val joined = exact.join(cand, Seq("id1", "id2"))
      .select(abs(col("jaccard") - col("est_jaccard")).as("err"))
    if (joined.count() > 0) {
      assert(joined.agg(avg("err")).head.getDouble(0) < 0.25)
    }
  }

  test("simhash near-dup pairs include high-jaccard pairs") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val sh = Dedup.simHashPairs(docs, "doc_id", "text", 6)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val recall = exact.count(sh.contains).toDouble / math.max(1, exact.size)
    assert(recall >= 0.5, s"simhash recall $recall over ${exact.size} pairs")
  }

  test("minHashVerifiedPairs equals the exact n-gram Jaccard answer") {
    // the sketch→verify pipeline must reproduce the exact oracle's
    // output bit-for-bit on the fixture (q27 === q25's contract)
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .orderBy("id1", "id2").collect().toSeq
    val verified = Dedup.minHashVerifiedPairs(docs, "doc_id", "text", 3, 0.5)
      .orderBy("id1", "id2").collect().toSeq
    assert(exact.nonEmpty)
    assert(verified == exact)
  }

  test("short docs with trailing space never emit empty-signature pairs") {
    // split-semantics trap: Spark's split("a b ") keeps a trailing
    // empty token while the native tokenizer drops it; docs below the
    // shingle width must be excluded on the SIGNATURE basis, else all
    // of them share the sentinel signature and pair at est=1.0
    val df = Seq((1L, "a b "), (2L, "x y "), (3L, "p q "))
      .toDF("doc_id", "text")
    assert(Dedup.minHashCandidates(df, "doc_id", "text", 3, 0.0).count() == 0)
  }

  test("hammingDistance counts differing bits") {
    val df = Seq((5L, 6L)).toDF("a", "b") // 101 vs 110 → 2 bits differ
    assert(df.select(Dedup.hammingDistance(col("a"), col("b"))).head.getInt(0) == 2)
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = graft.core.Tables.embeddings(spark, sf)

  /** Driver-side reference top-k for one query id. */
  private def referenceTopK(qid: Long, k: Int): Seq[Long] = {
    val all = emb.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
    val q = all.find(_._1 == qid).get._2.map(_.toDouble)
    def cos(v: Seq[Float]): Double = {
      val x = v.map(_.toDouble)
      val d = x.zip(q).map { case (a, b) => a * b }.sum
      d / (math.sqrt(x.map(a => a * a).sum) * math.sqrt(q.map(a => a * a).sum))
    }
    all.filter(_._1 != qid).map { case (id, v) => (id, cos(v)) }
      .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSeq
  }

  test("cosineNearDups fails loudly when a block exceeds maxBlockSize") {
    val small = emb.limit(5).withColumn("lbl", org.apache.spark.sql.functions.lit("one"))
    val e = intercept[Exception] {
      Similarity.cosineNearDups(small, "lbl", 0.0, maxBlockSize = 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("cosineNearDupsLsh")), msgs(e))
    // within the cap it still runs exact
    assert(Similarity.cosineNearDups(small, "lbl", -1.0, maxBlockSize = 10)
      .count() == 10) // 5 choose 2
  }

  test("bruteTopK matches driver-side reference ranking") {
    val got = Similarity.bruteTopK(emb, Seq(0L), 10)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(got == referenceTopK(0L, 10))
  }

  test("slow and fast cosine tiers produce the same ranking") {
    val slow = Similarity.bruteTopK(emb, Seq(3L), 10, fast = false)
      .select("vec_id").as[Long].collect().toSeq
    val fast = Similarity.bruteTopK(emb, Seq(3L), 10, fast = true)
      .select("vec_id").as[Long].collect().toSeq
    assert(slow == fast)
  }

  test("lshTopK achieves useful recall against brute force") {
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val brute = Similarity.bruteTopK(emb, qids, 5)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(emb, qids, 5, 64, nPlanes = 4)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = brute.count(lsh.contains).toDouble / brute.size
    assert(recall >= 0.3, s"lsh recall $recall") // approximate by design
    // and every LSH hit must be a real corpus vector with sane sim
    assert(Similarity.lshTopK(emb, qids, 5, 64, nPlanes = 4)
      .where(col("sim") > 1.0001 || col("sim") < -1.0001).count() == 0)
  }
}
