package graft.llm

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** The q232 curation-v5 composition (exact-substring scrub → re-chunk
  * → re-pack): the scrubText/scrub API parity, the fully-scrubbed-doc
  * drop rule, and the SCALE.md diamond policy — the scrubbed corpus
  * is consumed by three branches (chunking, packing, audit join) and
  * must be served from ONE persisted materialization, not recomputed
  * per branch. */
class CurationV5Spec extends SparkSpec {
  import spark.implicits._

  test("scrubText and scrub agree on every count and on the kept token sequence") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val a = ExactSubstring.scrub(d, "doc_id", "text", 8)
      .select(col("doc_id"), col("n_words"), col("n_removed"), col("text_md5"))
    val b = ExactSubstring.scrubText(d, "doc_id", "text", 8)
      .select(col("doc_id"), (col("n_kept") + col("n_removed")).as("n_words"),
        col("n_removed"), md5(col("text").cast("binary")).as("text_md5"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "scrub and scrubText diverged")
    spark.catalog.clearCache()
  }

  test("a document that is entirely duplicated text is scrubbed to empty and dropped") {
    // doc 2 is verbatim the first 8 tokens of doc 1 → every token of
    // doc 2 sits in a duplicated extent whose canonical copy is in
    // doc 1 (smaller (doc_id, idx)), so doc 2 scrubs to ''
    val docs = Seq(
      (1L, "a b c d e f g h unique tail words here"),
      (2L, "a b c d e f g h"))
      .toDF("doc_id", "text")
    val out = ExactSubstring.scrubText(docs, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L)._2 == 12L, "canonical doc must keep all tokens")
    assert(out(2L) == (("", 0L)), "fully-duplicated doc must scrub to empty")
    spark.catalog.clearCache()
  }

  test("q232 runs green and serves the scrubbed fork from one persisted frame") {
    val res = SparkEntry.queries("q232_curation_v5")(spark, sf)
    val rows = res.collect()
    assert(rows.length > 0)
    // chunk ids consecutive from 0 per doc; packs monotone over docs
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.values.foreach { rs =>
      val ids = rs.map(_.getLong(1)).sorted
      assert(ids.head == 0L && ids.zipWithIndex.forall { case (c, i) => c == i })
    }
    // diamond policy: the three consumers of the scrubbed corpus
    // (chunk explode, pack join, audit join) must all read the
    // persisted fork — the executed plan shows InMemoryTableScan,
    // and the expensive scrub window pipeline appears only inside
    // the cached build, not once per branch
    val plan = res.queryExecution.executedPlan.toString
    val scans = "InMemoryTableScan".r.findAllIn(plan).size
    assert(scans >= 2, s"expected the scrubbed fork cached and re-read, got:\n$plan")
    spark.catalog.clearCache()
  }
}
