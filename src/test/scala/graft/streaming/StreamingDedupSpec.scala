package graft.streaming

import graft.SparkSpec
import graft.llm.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming-vs-batch parity for [[Dedup.incrementalNearDupsStream]]:
  * the union of the per-batch pair segments must equal the one-shot
  * [[Dedup.minHashVerifiedPairs]] of the batches CONCATENATED (every
  * unordered pair found exactly once, in the batch where its later
  * document arrives), the seed-index path must contribute cross pairs
  * without re-finding history×history, and a replay of the whole
  * lineage must REWRITE segments, not double-append. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  /** 20 sequential pool words starting at `from`. */
  private def words(from: Int): Seq[String] = (from until from + 20).map(i => s"w$i")
  private def doc(ws: Seq[String]): String = ws.mkString(" ")
  /** A ~0.8-jaccard (3-shingle) variant: last two words replaced. */
  private def variant(ws: Seq[String], tag: Int): String =
    doc(ws.dropRight(2) ++ Seq(s"x${tag}a", s"x${tag}b"))

  private val batches: Seq[Seq[(Long, String)]] = Seq(
    Seq(1L -> doc(words(0)), 2L -> doc(words(100)), 3L -> variant(words(0), 3)),
    Seq(4L -> variant(words(0), 4), 5L -> doc(words(200))),
    Seq(6L -> variant(words(200), 6), 7L -> doc(words(300)),
      8L -> variant(words(300), 8)))

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  /** Runs the three fixture batches; returns the checkpoint dir (the
    * compaction tests derive their replay-safe bound from it). */
  private def runStream(idxDir: String, pairsDir: String): String = {
    implicit val sqlCtx = spark.sqlContext
    val ck = tmp("nds-ck")
    val ms = MemoryStream[(Long, String)]
    val q = Dedup.incrementalNearDupsStream(
      ms.toDF().toDF("doc_id", "text"), idxDir, pairsDir, ck,
      "doc_id", "text", n = 3, threshold = 0.5)
    try batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.catalog.clearCache()
    ck
  }

  private def pairSet(pairsDir: String): Set[(Long, Long, Double)] =
    spark.read.parquet(s"$pairsDir/b*")
      .select("id1", "id2", "jaccard")
      .as[(Long, Long, Double)].collect().toSet

  test("streamed pair segments equal the one-shot batch run of the concatenated corpus") {
    val (idxDir, pairsDir) = (tmp("nds-idx"), tmp("nds-pairs"))
    runStream(idxDir, pairsDir)
    val streamed = pairSet(pairsDir)
    val full = Dedup.minHashVerifiedPairs(
        batches.flatten.toDF("doc_id", "text"), "doc_id", "text", 3, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    spark.catalog.clearCache()
    assert(full.nonEmpty, "fixture must contain near-dup pairs")
    // the fixture plants pairs in all three positions: within-batch
    // (1,3), cross-batch (1,4)/(3,4)/(5,6), late within-batch (7,8)
    assert(full.map(p => (p._1, p._2)).intersect(
      Set((1L, 3L), (1L, 4L), (3L, 4L), (5L, 6L), (7L, 8L))).size == 5)
    assert(streamed == full,
      s"stream/batch divergence: only-stream=${streamed -- full}, " +
        s"only-batch=${full -- streamed}")
    // one index segment per batch, sketches only (no text column)
    val segs = new java.io.File(idxDir).listFiles().map(_.getName).toSet
    assert(segs == Set("b0", "b1", "b2"), segs.toString)
    val idx = spark.read.parquet(s"$idxDir/b0")
    assert(idx.columns.toSet == Set("doc_id", "sigb", "shhb", "shingle_n"))
  }

  test("a replayed lineage rewrites the same segments instead of double-appending") {
    val (idxDir, pairsDir) = (tmp("nds-idx2"), tmp("nds-pairs2"))
    runStream(idxDir, pairsDir)
    val first = pairSet(pairsDir)
    // same dirs, fresh checkpoint: batch ids restart at 0 and every
    // segment is rewritten in place (the applyChangesStream overwrite
    // discipline) — and batch b must NOT join the b<b>-segment its
    // previous incarnation left behind (only segments < b are read)
    runStream(idxDir, pairsDir)
    assert(pairSet(pairsDir) == first)
    assert(new java.io.File(idxDir).listFiles().map(_.getName).toSet ==
      Set("b0", "b1", "b2"))
  }

  test("compaction folds segments into one seed and ingest parity holds") {
    implicit val sqlCtx = spark.sqlContext
    val (idxDir, pairsDir) = (tmp("nds-idx4"), tmp("nds-pairs4"))
    val ck = runStream(idxDir, pairsDir) // b0, b1, b2
    // the replay-safe bound comes from the stream's OWN checkpoint:
    // three committed batches -> bound 3 -> all segments compactable
    assert(Dedup.committedBatchBound(spark, ck) == 3L)
    Dedup.compactSketchIndexCommitted(spark, idxDir, ck)
    val segs = new java.io.File(idxDir).listFiles().map(_.getName).toSet
    assert(segs == Set("seed_c3"), segs.toString)
    // a SECOND lineage over the compacted index (fresh checkpoint,
    // fresh pairs dir): its pairs must be exactly the concatenated
    // one-shot answer minus the pairs internal to the compacted
    // history — same as an uncompacted b0..b2 index would give
    val ms = MemoryStream[(Long, String)]
    val pairs2 = tmp("nds-pairs4b")
    val q = Dedup.incrementalNearDupsStream(
      ms.toDF().toDF("doc_id", "text"), idxDir, pairs2, tmp("nds-ck4"),
      "doc_id", "text", n = 3, threshold = 0.5)
    try {
      ms.addData(9L -> variant(words(200), 9), 10L -> doc(words(600)))
      q.processAllAvailable()
    } finally q.stop()
    spark.catalog.clearCache()
    val got = pairSet(pairs2).map(p => (p._1, p._2))
    // 9 is a variant of 5 (history, batch 1) and of 6 (history, batch
    // 2, itself a variant of 5); 10 matches nothing
    assert(got == Set((5L, 9L), (6L, 9L)), got.toString)
    // compacting an already-compact index is a no-op
    Dedup.compactSketchIndex(spark, idxDir, upToBatch = 0)
    assert(new java.io.File(idxDir).listFiles().map(_.getName).toSet
      .contains("seed_c3"))
  }

  test("compaction keeps a re-ingested doc's differing sketches, collapses crash copies") {
    val idxDir = tmp("nds-idx7")
    // doc 42 ingested twice with DIFFERENT text (both sketches must
    // survive), plus a byte-identical crash copy of the first (must
    // collapse — the rename-before-delete heal case)
    Dedup.writeSketchIndex(Seq(42L -> doc(words(700))).toDF("doc_id", "text"),
      "doc_id", "text", 3, s"$idxDir/seedA")
    Dedup.writeSketchIndex(Seq(42L -> variant(words(700), 9)).toDF("doc_id", "text"),
      "doc_id", "text", 3, s"$idxDir/seedB")
    Dedup.writeSketchIndex(Seq(42L -> doc(words(700))).toDF("doc_id", "text"),
      "doc_id", "text", 3, s"$idxDir/seedCrashCopy")
    // no stream ever ran here: a fresh/missing checkpoint bounds to 0,
    // which still compacts seed segments (only bK wait for commits)
    assert(Dedup.committedBatchBound(spark, tmp("nds-ck-none")) == 0L)
    Dedup.compactSketchIndex(spark, idxDir, upToBatch = 0)
    val rows = spark.read.parquet(s"$idxDir/seed_c0")
      .select("doc_id", "sigb").collect()
    assert(rows.length == 2, s"want both sketch variants, got ${rows.length}")
    assert(rows.forall(_.getLong(0) == 42L))
    val sigs = rows.map(_.getAs[Array[Byte]]("sigb").toSeq).toSet
    assert(sigs.size == 2, "the two differing sketches must both survive")
  }

  test("upToBatch leaves later segments in place for replay safety") {
    val (idxDir, pairsDir) = (tmp("nds-idx5"), tmp("nds-pairs5"))
    runStream(idxDir, pairsDir) // b0, b1, b2
    Dedup.compactSketchIndex(spark, idxDir, upToBatch = 2)
    val segs = new java.io.File(idxDir).listFiles().map(_.getName).toSet
    assert(segs == Set("seed_c2", "b2"), segs.toString)
    // folded content = b0 ∪ b1: ids 1-5; b2 keeps 6-8
    val seed = spark.read.parquet(s"$idxDir/seed_c2")
      .select("doc_id").as[Long].collect().toSet
    assert(seed == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("hot-bucket fence sees the same occupancy before and after compaction") {
    implicit val sqlCtx = spark.sqlContext
    // two seed segments, each with 3 IDENTICAL-text docs (identical
    // sketches → every band bucket holds all six): per-segment
    // occupancy 3, union occupancy 6. With maxBucketSize=4 the bucket
    // is hot ONLY in the union — the ingest fence must behave
    // identically against the split and the compacted index (prior
    // segments are read as one union either way; this is the case
    // SCALE.md once mis-described as per-segment fencing).
    def seedDocs(from: Long, n: Int): Seq[(Long, String)] =
      (0 until n).map(i => (from + i) -> doc(words(800)))
    def freshIndex(): String = {
      val idxDir = tmp("nds-idx6")
      Dedup.writeSketchIndex(seedDocs(301L, 3).toDF("doc_id", "text"),
        "doc_id", "text", 3, s"$idxDir/seedA")
      Dedup.writeSketchIndex(seedDocs(304L, 3).toDF("doc_id", "text"),
        "doc_id", "text", 3, s"$idxDir/seedB")
      idxDir
    }
    def ingest(idxDir: String, cap: Int): Set[(Long, Long)] =
      Dedup.incrementalNearDups(
          Seq(401L -> variant(words(800), 99)).toDF("doc_id", "text"),
          s"$idxDir/*", "doc_id", "text", n = 3, threshold = 0.3,
          maxBucketSize = cap)
        .select("new_id", "hist_id").as[(Long, Long)].collect().toSet
    val split = freshIndex()
    val compacted = freshIndex()
    Dedup.compactSketchIndex(spark, compacted, upToBatch = 0)
    assert(new java.io.File(compacted).listFiles().map(_.getName).toSet
      == Set("seed_c0"))
    // capped at 4: union-hot bucket is fenced the same both ways
    val fencedSplit = ingest(split, cap = 4)
    val fencedCompact = ingest(compacted, cap = 4)
    assert(fencedSplit == fencedCompact,
      s"fence divergence: split=$fencedSplit compacted=$fencedCompact")
    // capped at 10: the same pairs come back both ways, and they exist
    val openSplit = ingest(split, cap = 10)
    val openCompact = ingest(compacted, cap = 10)
    assert(openSplit == openCompact && openSplit.nonEmpty)
    assert(openSplit.map(_._2) == Set(301L, 302L, 303L, 304L, 305L, 306L))
    // and the fence actually bit at cap=4 (otherwise this test is vacuous)
    assert(fencedSplit != openSplit)
  }

  test("seed history contributes cross pairs but history-internal pairs stay out") {
    implicit val sqlCtx = spark.sqlContext
    val (idxDir, pairsDir) = (tmp("nds-idx3"), tmp("nds-pairs3"))
    // h1/h2 are near-dups of each other — that pair belongs to the
    // history ingest that built the seed, not to this stream
    Dedup.writeSketchIndex(
      Seq(101L -> doc(words(400)), 102L -> variant(words(400), 2))
        .toDF("doc_id", "text"),
      "doc_id", "text", 3, s"$idxDir/seed")
    val ms = MemoryStream[(Long, String)]
    val q = Dedup.incrementalNearDupsStream(
      ms.toDF().toDF("doc_id", "text"), idxDir, pairsDir, tmp("nds-ck3"),
      "doc_id", "text", n = 3, threshold = 0.5)
    try {
      ms.addData(201L -> variant(words(400), 9), 202L -> doc(words(500)))
      q.processAllAvailable()
    } finally q.stop()
    spark.catalog.clearCache()
    val got = pairSet(pairsDir).map(p => (p._1, p._2))
    assert(got == Set((101L, 201L), (102L, 201L)), got.toString)
  }
}
