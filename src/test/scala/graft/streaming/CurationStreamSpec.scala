package graft.streaming

import graft.SparkSpec
import graft.llm.Curation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming-vs-batch parity for the curation-v14 capstone
  * ([[Curation.v14Stream]]): the union of per-batch survivor
  * segments must equal the one-shot [[Curation.v14Batch]] of the
  * batches CONCATENATED — every gate drops on the batch it arrives
  * in, every keep-first key blocks across batches — and a replayed
  * lineage must REWRITE segments, not double-append (the
  * applyChangesStream idempotency discipline). */
class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  private type PageRow = (Long, Int, String, String, String,
    Option[String], Long, Long, Option[String])

  /** warcDocRows' kind-discriminated schema (v16 stream input). */
  private type RowT = (Long, Int, String, String, String, String,
    Option[String], Long, Long, Option[String], Option[Int],
    Option[String])

  private def enTxt(i: Int): String =
    s"the quick brown fox number $i jumps over the lazy dog and " +
      "keeps running through the quiet morning field without a pause."

  private def page(id: Long, url: String, text: String,
                   xRobots: Option[String] = None,
                   codes: Long = 0L, unmapped: Long = 0L,
                   canonical: Option[String] = None): PageRow =
    (id, 0, url, "html", text, xRobots, codes, unmapped, canonical)

  /** Three in-order batches planting every drop class plus both
    * CROSS-BATCH keep-first shapes (same canonical URL later, same
    * text later) and a cross-batch canonical-link consolidation. */
  private val batches: Seq[Seq[PageRow]] = Seq(
    Seq(
      page(1, "http://ok.site/a/1", enTxt(1)),
      page(2, "http://dup.example/p", enTxt(2)),
      page(3, "http://ok.site/short", "tiny"), // length gate
      page(4, "http://sub.bad.example/x", enTxt(4)), // domain blocklist
      page(5, "http://ok.site/noidx", enTxt(5), xRobots = Some("noindex"))),
    Seq(
      page(6, "http://DUP.example:80/p", enTxt(6)), // url dup of 2 (canon)
      page(7, "http://ok.site/t", enTxt(1)), // text dup of 1
      page(8, "http://ok.site/xxx-casino/8", enTxt(8)), // term gate
      page(9, "http://ok.site/conf", enTxt(9), codes = 10L, unmapped = 9L),
      page(10, "http://ok.site/b/10", enTxt(10))),
    Seq(
      page(11, "http://mirror.site/m/11", enTxt(11),
        canonical = Some("http://dup.example/p")), // canonical dup of 2
      page(12, "http://ok.site/c/12", enTxt(12))))

  private val block = Seq("bad.example", "spam.test")

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  private def runStream(outDir: String, keysDir: String): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[PageRow]
    val q = Curation.v14Stream(
      ms.toDF().toDF("media_id", "record_idx", "url", "carrier", "text",
        "x_robots", "type0_codes", "type0_unmapped", "canonical"),
      block, outDir, keysDir, tmp("cur-ck"))
    try batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.catalog.clearCache()
  }

  private def survivors(outDir: String): Set[(Long, String, String)] =
    spark.read.parquet(s"$outDir/b*")
      .select("media_id", "url", "text")
      .as[(Long, String, String)].collect().toSet

  test("streamed survivor segments equal the one-shot v14 of the concatenation") {
    val (outDir, keysDir) = (tmp("cur-out"), tmp("cur-keys"))
    runStream(outDir, keysDir)
    val streamed = survivors(outDir)
    val full = Curation.v14Batch(
        batches.flatten.toDF("media_id", "record_idx", "url", "carrier",
          "text", "x_robots", "type0_codes", "type0_unmapped", "canonical"),
        block)
      .select("media_id", "url", "text")
      .as[(Long, String, String)].collect().toSet
    spark.catalog.clearCache()
    // the fixture's survivor set is exactly the planted keeps: every
    // drop class fired, both cross-batch keep-firsts blocked
    assert(full.map(_._1) == Set(1L, 2L, 10L, 12L), full.toString)
    assert(streamed == full,
      s"stream/batch divergence: only-stream=${streamed -- full}, " +
        s"only-batch=${full -- streamed}")
    // one survivor segment and one key segment per batch
    val segs = new java.io.File(outDir).listFiles().map(_.getName).toSet
    assert(segs == Set("b0", "b1", "b2"), segs.toString)
  }

  test("v15 streaming leg: per-domain running counts replicate the one-shot cap") {
    val (outDir, keysDir, countsDir) =
      (tmp("cur15-out"), tmp("cur15-keys"), tmp("cur15-counts"))
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[PageRow]
    val q = Curation.v15Stream(
      ms.toDF().toDF("media_id", "record_idx", "url", "carrier", "text",
        "x_robots", "type0_codes", "type0_unmapped", "canonical"),
      block, domainCap = 2, outDir, keysDir, countsDir, tmp("cur15-ck"))
    try batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.catalog.clearCache()
    val streamed = spark.read.parquet(s"$outDir/b*")
      .select("media_id", "domain", "domain_rank")
      .as[(Long, String, Long)].collect().toSet
    val full = Curation.v15Batch(
        batches.flatten.toDF("media_id", "record_idx", "url", "carrier",
          "text", "x_robots", "type0_codes", "type0_unmapped", "canonical"),
        block, domainCap = 2)
      .select("media_id", "domain", "domain_rank")
      .as[(Long, String, Long)].collect().toSet
    spark.catalog.clearCache()
    // v14 survivors are 1, 2, 10, 12 with ok.site carrying 1, 10, 12:
    // the cap=2 cut drops 12 — and the streamed leg must drop it in
    // batch 2 via the PRIOR counts (1 arrived in b0, 10 in b1)
    assert(full == Set((1L, "ok.site", 1L), (10L, "ok.site", 2L),
      (2L, "dup.example", 1L)), full.toString)
    assert(streamed == full,
      s"v15 stream/batch divergence: only-stream=${streamed -- full}, " +
        s"only-batch=${full -- streamed}")
  }

  test("v15 streaming leg: NULL-domain rows share ONE capped group across batches") {
    // hosts with NO registrable domain — a public suffix (co.uk) and
    // an IP literal — yield domain NULL. v15Batch's window groups all
    // NULLs into one partition capped at domainCap; the streamed leg
    // must do the same ACROSS batches, which a plain equi-join on the
    // nullable domain silently breaks (null keys never match, so each
    // batch re-capped its null group from zero — ADVICE r17). The
    // sentinel-keyed counts make batch 2's arrival see prior=2 and
    // drop.
    val nullBatches: Seq[Seq[PageRow]] = Seq(
      Seq(page(1, "http://co.uk/a/1", enTxt(21)),
        page(2, "http://198.51.100.7/b/2", enTxt(22))),
      Seq(page(3, "http://co.uk/a/3", enTxt(23))),
      Seq(page(4, "http://203.0.113.9/c/4", enTxt(24))))
    val (outDir, keysDir, countsDir) =
      (tmp("curnull-out"), tmp("curnull-keys"), tmp("curnull-counts"))
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[PageRow]
    val q = Curation.v15Stream(
      ms.toDF().toDF("media_id", "record_idx", "url", "carrier", "text",
        "x_robots", "type0_codes", "type0_unmapped", "canonical"),
      block, domainCap = 2, outDir, keysDir, countsDir, tmp("curnull-ck"))
    try nullBatches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.catalog.clearCache()
    val streamed = spark.read.parquet(s"$outDir/b*")
      .select("media_id", "domain", "domain_rank")
      .as[(Long, Option[String], Long)].collect().toSet
    val full = Curation.v15Batch(
        nullBatches.flatten.toDF("media_id", "record_idx", "url", "carrier",
          "text", "x_robots", "type0_codes", "type0_unmapped", "canonical"),
        block, domainCap = 2)
      .select("media_id", "domain", "domain_rank")
      .as[(Long, Option[String], Long)].collect().toSet
    spark.catalog.clearCache()
    assert(full == Set((1L, None, 1L), (2L, None, 2L)), full.toString)
    assert(streamed == full,
      s"null-domain stream/batch divergence: only-stream=${streamed -- full}, " +
        s"only-batch=${full -- streamed}")
  }

  test("v16 streaming leg: redirect identity resolves across batches; cycles survive") {
    // kind-discriminated rows (the warcDocRows schema): a page, the
    // 3xx edge moving an old URL onto it, a page AT the old URL with
    // different text (only the resolved identity can drop it), a
    // CROSS-BATCH case (edge in b0, aliased page in b1), and a
    // planted 2-cycle whose page must survive (hop-bound cuts are
    // not identities).
    def pageRow(id: Long, url: String, text: String): RowT =
      (id, 0, "page", url, "html", text, None, 0L, 0L, None, None, None)
    def edgeRow(id: Long, url: String, target: String): RowT =
      (id, 1, "redirect", url, null, null, None, 0L, 0L, None,
        Some(301), Some(target))
    val rowBatches: Seq[Seq[RowT]] = Seq(
      Seq(pageRow(1, "http://site.a/p1", enTxt(31)),
        edgeRow(2, "http://old.a/x", "http://site.a/p1"),
        pageRow(3, "http://old.a/x", enTxt(33)), // same-batch alias: drop
        edgeRow(4, "http://moved.b/y", "http://site.a/p1")),
      Seq(pageRow(5, "http://moved.b/y", enTxt(35)), // cross-batch alias: drop
        pageRow(6, "http://cyc.c/p", enTxt(36)), // cycle page: SURVIVES
        edgeRow(7, "http://cyc.c/p", "http://cyc2.c/p"),
        edgeRow(8, "http://cyc2.c/p", "http://cyc.c/p")))
    val (outDir, keysDir, countsDir, edgesDir) =
      (tmp("cur16-out"), tmp("cur16-keys"), tmp("cur16-counts"),
        tmp("cur16-edges"))
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[RowT]
    val cols = Seq("media_id", "record_idx", "kind", "url", "carrier",
      "text", "x_robots", "type0_codes", "type0_unmapped", "canonical",
      "status", "target")
    val q = Curation.v16Stream(ms.toDF().toDF(cols: _*), block,
      domainCap = 2, outDir, keysDir, countsDir, edgesDir, tmp("cur16-ck"))
    try rowBatches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.catalog.clearCache()
    val streamed = spark.read.parquet(s"$outDir/b*")
      .select("media_id", "url", "domain", "domain_rank")
      .as[(Long, String, String, Long)].collect().toSet
    // batch twin over the concatenation (edges precede/co-batch their
    // pages, so parity holds)
    val all = rowBatches.flatten.toDF(cols: _*)
    val full = graft.llm.Curation.v16Batch(
        all.where(col("kind") === "page").drop("kind", "status", "target"),
        all.where(col("kind") === "redirect")
          .select(graft.functions.CanonicalUrl(col("url")).as("src"),
            col("target").as("dst")),
        block, domainCap = 2)
      .select("media_id", "url", "domain", "domain_rank")
      .as[(Long, String, String, Long)].collect().toSet
    spark.catalog.clearCache()
    assert(full == Set((1L, "http://site.a/p1", "site.a", 1L),
      (6L, "http://cyc.c/p", "cyc.c", 1L)), full.toString)
    assert(streamed == full,
      s"v16 stream/batch divergence: only-stream=${streamed -- full}, " +
        s"only-batch=${full -- streamed}")
  }

  test("v17 streaming leg: tracking-param identity folds across batches") {
    // v16's shapes with tracking params in the mix: a utm capture
    // and its bare CROSS-BATCH re-crawl (different text) must fold
    // to one key; a 301 whose source and Location both carry
    // tracking params still re-keys the old page; a real `page=2`
    // param keeps its identity.
    def pageRow(id: Long, url: String, text: String): RowT =
      (id, 0, "page", url, "html", text, None, 0L, 0L, None, None, None)
    def edgeRow(id: Long, url: String, target: String): RowT =
      (id, 1, "redirect", url, null, null, None, 0L, 0L, None,
        Some(301), Some(target))
    val rowBatches: Seq[Seq[RowT]] = Seq(
      Seq(pageRow(1, "http://site.a/p1?utm_source=nl", enTxt(41)),
        edgeRow(2, "http://old.a/x?utm_campaign=q", // folded edge src
          "http://site.a/p1?utm_medium=email")), // folded edge dst
      Seq(pageRow(3, "http://site.a/p1?fbclid=F3", enTxt(43)), // cross-batch fold: drop
        pageRow(4, "http://old.a/x", enTxt(44)), // resolves onto p1: drop
        pageRow(5, "http://site.a/p1?page=2", enTxt(45)))) // real param: keeps
    val (outDir, keysDir, countsDir, edgesDir) =
      (tmp("cur17-out"), tmp("cur17-keys"), tmp("cur17-counts"),
        tmp("cur17-edges"))
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[RowT]
    val cols = Seq("media_id", "record_idx", "kind", "url", "carrier",
      "text", "x_robots", "type0_codes", "type0_unmapped", "canonical",
      "status", "target")
    val q = Curation.v17Stream(ms.toDF().toDF(cols: _*), block,
      domainCap = 3, outDir, keysDir, countsDir, edgesDir, tmp("cur17-ck"))
    try rowBatches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.catalog.clearCache()
    val streamed = spark.read.parquet(s"$outDir/b*")
      .select("media_id", "url", "domain", "domain_rank")
      .as[(Long, String, String, Long)].collect().toSet
    val all = rowBatches.flatten.toDF(cols: _*)
    val full = graft.llm.Curation.v17Batch(
        all.where(col("kind") === "page").drop("kind", "status", "target"),
        all.where(col("kind") === "redirect")
          .select(graft.functions.CanonicalUrl(col("url")).as("src"),
            col("target").as("dst")),
        block, domainCap = 3)
      .select("media_id", "url", "domain", "domain_rank")
      .as[(Long, String, String, Long)].collect().toSet
    spark.catalog.clearCache()
    assert(full == Set((1L, "http://site.a/p1", "site.a", 1L),
      (5L, "http://site.a/p1?page=2", "site.a", 2L)), full.toString)
    assert(streamed == full,
      s"v17 stream/batch divergence: only-stream=${streamed -- full}, " +
        s"only-batch=${full -- streamed}")
  }

  test("a replayed lineage rewrites the same segments instead of double-appending") {
    val (outDir, keysDir) = (tmp("cur-out2"), tmp("cur-keys2"))
    runStream(outDir, keysDir)
    val first = survivors(outDir)
    // same dirs, fresh checkpoint: batch ids restart at 0 — every
    // segment must REWRITE to the same content
    runStream(outDir, keysDir)
    assert(survivors(outDir) == first)
    val n = spark.read.parquet(s"$outDir/b*").count()
    assert(n == first.size, s"double-append: $n rows for ${first.size} survivors")
  }
}
