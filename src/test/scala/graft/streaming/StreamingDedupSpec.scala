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

  private def runStream(idxDir: String, pairsDir: String): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = Dedup.incrementalNearDupsStream(
      ms.toDF().toDF("doc_id", "text"), idxDir, pairsDir, tmp("nds-ck"),
      "doc_id", "text", n = 3, threshold = 0.5)
    try batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.catalog.clearCache()
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
