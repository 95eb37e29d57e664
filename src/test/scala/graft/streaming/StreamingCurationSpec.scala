package graft.streaming

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.llm.Chunking
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The curation stages that are MAP-ONLY (PII scrub, repetition
  * gate, token-window chunking) run UNCHANGED under Structured
  * Streaming — no special streaming variants needed, because none of
  * them shuffles or holds state. This spec pins that: the same
  * `Repetition.stats` / `redactPii` / `chunkTokens` calls compose
  * over a MemoryStream and match the batch result on the same rows.
  * (The stateful stages — dedup, packing — have their explicit
  * streaming counterparts: `StatefulOps.dedupFirst`, and packing is a
  * per-batch concern by design.)
  */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, "the table has value mail me at a@b.co thanks a lot more words here"),
    (2L, "spam spam spam spam spam spam spam spam spam spam spam spam"),
    (3L, "short"),
    (4L, "a perfectly ordinary document with several distinct words in it"))

  private def curate(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.graft.ColumnBridge
    val scrubbed = df.select(col("id"),
      TextFunctions.redactPii(col("text")).as("text"))
    // the gate is ONE fused-expression projection — no join, no state
    val st = ColumnBridge.column(graft.functions.RepetitionStats(
      ColumnBridge.expression(col("text")), 2, 3))
    val gated = scrubbed.withColumn("__st", st)
      .where(col("__st.dup_gram_chars") * 2 < length(col("text")))
      .select("id", "text")
    Chunking.chunkTokens(gated, "id", "text", maxTokens = 6, overlap = 2)
  }

  test("map-only curation stages compose identically in batch and stream") {
    implicit val sqlCtx = spark.sqlContext
    val batch = curate(rows.toDF("id", "text"))
      .select("id", "chunk_id", "chunk").as[(Long, Long, String)].collect().toSet
    assert(batch.nonEmpty)
    assert(batch.exists(_._3.contains("<EMAIL>")), "scrub visible in chunks")
    assert(!batch.exists(_._1 == 2L), "repetitive doc gated out")

    val ms = MemoryStream[(Long, String)]
    val q = curate(ms.toDF().toDF("id", "text"))
      .writeStream.format("memory").queryName("curated").outputMode("append").start()
    try {
      ms.addData(rows.take(2): _*)
      q.processAllAvailable()
      ms.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("curated")
        .select("id", "chunk_id", "chunk").as[(Long, Long, String)].collect().toSet
      assert(streamed == batch, "stream result diverged from batch")
    } finally q.stop()
  }
}
