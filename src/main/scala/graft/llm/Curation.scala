package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The curation-v14 chain as a REUSABLE operator — the q337 capstone
  * (URL gate → X-Robots → length → extraction-confidence → LangId →
  * quality → canonical-URL keep-first → content keep-first) factored
  * out of the query so it runs as EITHER one batch pass or a
  * Structured Streaming `foreachBatch` leg with the
  * [[graft.ops.Merge.applyChangesStream]] idempotency discipline
  * (r16 verdict item 7: the capstone was batch-only).
  *
  * Input schema: the [[graft.sources.Warc]] doc-text router's
  * columns plus `media_id` — (media_id, record_idx, url, carrier,
  * text, x_robots, type0_codes, type0_unmapped, canonical).
  *
  * Scale posture (unchanged from q337): the gate stage is per-record
  * — pushed URL/length/confidence predicates, the LangId/quality
  * kernels, one broadcast LeftSemi against the O(list) blocklist;
  * the ONLY cross-record state is the two keep-first keys
  * (canonical URL, text), which stream as bounded per-batch key
  * segments exactly like the incremental-dedup index
  * ([[Dedup.incrementalNearDupsStream]]). */
object Curation {

  /** The per-record gate stage — a PURE function of its input rows
    * (no cross-record state): URL gate (label-boundary domain
    * blocklist via bounded suffix-explode + broadcast semi-join,
    * term rlike), X-Robots noindex, length, Type0
    * extraction-confidence ratio, confident-foreign LangId drop,
    * quality score; survivors carry their canonical-URL dedup key
    * (canonical link preferred — the v13 consolidation). */
  def v14Gates(pages: DataFrame, blockDomains: Seq[String]): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val blocklist = blockDomains.toDF("bdomain")
    val withHost = pages.withColumn("host",
      regexp_extract(col("url"), "^[a-z]+://([^/:]+)", 1))
    val blockedIds = withHost.select(col("media_id"), col("record_idx"),
        explode(expr(
          "transform(sequence(1, size(split(host, '\\\\.'))), " +
            "i -> array_join(slice(split(host, '\\\\.'), i, 100), '.'))"))
          .as("suffix"))
      .join(broadcast(blocklist), col("suffix") === col("bdomain"),
        "left_semi")
      .select(col("media_id"), col("record_idx")).distinct()
      .withColumn("domain_blocked", lit(true))
    val gated = withHost
      .join(blockedIds, Seq("media_id", "record_idx"), "left")
      .where(coalesce(col("domain_blocked"), lit(false)) === false)
      .where(!lower(col("url")).rlike("(xxx|casino|viagra)"))
      .where(!graft.functions.XRobotsTag.noindex(col("x_robots")))
      .where(length(col("text")) >= 20)
      .where(col("type0_unmapped") * 5 <= col("type0_codes"))
    LangId.withCrawlLang(gated, "text")
      .where(!(col("lang_total") >= 8 && col("pred_lang") =!= "en"))
      .where(graft.functions.TextFunctions.qualityScore(col("text")) >= 0.3)
      .withColumn("url_canon", graft.functions.CanonicalUrl(
        coalesce(col("canonical"), col("url"))))
      .select(col("media_id"), col("record_idx"), col("carrier"),
        col("url_canon"), col("text"))
  }

  private def keepFirstBy(rows: DataFrame, key: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col("media_id"), col("record_idx"))
    rows.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** One-shot v14: gates + canonical-URL keep-first + content
    * keep-first (the q337 shape — two WindowGroupLimit passes). */
  def v14Batch(pages: DataFrame, blockDomains: Seq[String]): DataFrame = {
    val gated = v14Gates(pages, blockDomains)
    keepFirstBy(keepFirstBy(gated, "url_canon"), "text")
      .select(col("media_id"), col("record_idx"), col("carrier"),
        col("url_canon").as("url"), col("text"))
  }

  /** Curation v15: v14 plus the PER-REGISTERED-DOMAIN dominance cap
    * (the FineWeb host-dominance rule): survivors key on eTLD+1 of
    * their canonical URL's host ([[graft.functions.RegisteredDomain]]
    * — the PSL algorithm, so every subdomain of a content farm
    * aggregates onto ONE key while `co.uk` itself never becomes
    * one), and each domain keeps its first `domainCap` survivors by
    * (media_id, record_idx). One more keyed WindowGroupLimit pass on
    * a LOWER-cardinality key than url_canon — no join, the PSL rules
    * are baked into the codegen'd expression. */
  def v15Batch(pages: DataFrame, blockDomains: Seq[String],
               domainCap: Int): DataFrame = {
    val kept = v14Batch(pages, blockDomains)
      .withColumn("domain", graft.functions.RegisteredDomain(
        regexp_extract(col("url"), "^[a-z]+://([^/:]+)", 1)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("domain"))
      .orderBy(col("media_id"), col("record_idx"))
    kept.withColumn("domain_rank", row_number().over(w))
      .where(col("domain_rank") <= domainCap)
      .select(col("media_id"), col("record_idx"), col("carrier"),
        col("url"), col("domain"),
        col("domain_rank").cast("long").as("domain_rank"), col("text"))
  }

  /** The Structured Streaming leg. Each micro-batch `b`:
    *
    *  1. runs the per-record gate stage on the batch alone,
    *  2. anti-joins strictly-earlier URL keys (`keysDir/b0…b(b−1)`),
    *     keep-firsts within the batch on `url_canon`,
    *  3. anti-joins strictly-earlier TEXT keys, keep-firsts within
    *     the batch on `text`,
    *  4. writes survivors to `outDir/b<b>` and this batch's keys
    *     (every gate-passer's url_canon + every URL-survivor's text
    *     — the two sets the one-shot windows consult) to
    *     `keysDir/b<b>`, each mode-overwrite.
    *
    * Idempotency (the applyChangesStream discipline): each segment
    * is a pure function of (strictly-earlier segments, the replayed
    * batch) — at-least-once replay REWRITES `b<b>` instead of
    * double-appending, and a replayed batch never reads keys its
    * failed attempt may have written (only segments `< b`).
    *
    * Parity: when deliveries respect the batch order key
    * (media_id, record_idx) — micro-batch boundaries anywhere — the
    * union of `outDir/b*` equals [[v14Batch]] of the concatenated
    * input (spec-pinned in CurationStreamSpec). Out-of-order
    * delivery degrades keep-FIRST to keep-EARLIEST-ARRIVAL, the
    * honest streaming semantic. Pass a fresh `checkpointDir` per
    * lineage (batch ids must start at 0). */
  def v14Stream(pages: DataFrame, blockDomains: Seq[String],
                outDir: String, keysDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    pages.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val gated = v14Gates(batch, blockDomains)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val (urlKept, survivors) =
            batchSurvivors(spark, gated, keysDir, batchId)
          survivors
            .select(col("media_id"), col("record_idx"), col("carrier"),
              col("url_canon").as("url"), col("text"))
            .write.mode("overwrite").parquet(s"$outDir/b$batchId")
          writeKeys(gated, urlKept, s"$keysDir/b$batchId")
        } finally { gated.unpersist(); () }
      }
      .start()
  }

  /** The shared per-batch keep-first body: anti-join strictly-earlier
    * URL keys, keep-first within the batch on url_canon, anti-join
    * earlier TEXT keys, keep-first on text. Returns (urlKept,
    * survivors). */
  private def batchSurvivors(spark: org.apache.spark.sql.SparkSession,
                             gated: DataFrame, keysDir: String,
                             batchId: Long): (DataFrame, DataFrame) = {
    import spark.implicits._
    val earlier = (0L until batchId).map(i => s"$keysDir/b$i")
      .filter(p => new java.io.File(p).exists())
    val (priorUrl, priorText) =
      if (earlier.isEmpty)
        (Seq.empty[String].toDF("url_canon"), Seq.empty[String].toDF("text"))
      else {
        val k = spark.read.parquet(earlier: _*)
        (k.where(col("kind") === "url").select(col("key").as("url_canon")),
         k.where(col("kind") === "text").select(col("key").as("text")))
      }
    val urlKept = keepFirstBy(
      gated.join(priorUrl, Seq("url_canon"), "left_anti"), "url_canon")
    val survivors = keepFirstBy(
      urlKept.join(priorText, Seq("text"), "left_anti"), "text")
    (urlKept, survivors)
  }

  private def writeKeys(gated: DataFrame, urlKept: DataFrame,
                        segment: String): Unit =
    gated.select(lit("url").as("kind"), col("url_canon").as("key"))
      .distinct()
      .unionAll(urlKept.select(lit("text").as("kind"),
        col("text").as("key")).distinct())
      .write.mode("overwrite").parquet(segment)

  /** [[v15Batch]]'s streaming leg: v14's per-batch keep-first state
    * PLUS the per-registered-domain running count as one more
    * bounded cross-batch state segment. Each micro-batch ranks its
    * own survivors within each domain, offsets by the TOTAL
    * v14-survivor count of earlier batches for that domain (the
    * one-shot ROW_NUMBER restated as prior-count + in-batch rank —
    * counts persist UNCAPPED, because a row past the cap still
    * consumes rank positions every later row in its domain sits
    * above), and keeps ranks ≤ `domainCap`. Same idempotency
    * discipline: `countsDir/b<b>` is a pure function of the replayed
    * batch, and only segments `< b` are read. Parity with
    * [[v15Batch]] under in-order delivery is spec-pinned. */
  def v15Stream(pages: DataFrame, blockDomains: Seq[String], domainCap: Int,
                outDir: String, keysDir: String, countsDir: String,
                checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    pages.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val gated = v14Gates(batch, blockDomains)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val (urlKept, survivors0) =
            batchSurvivors(spark, gated, keysDir, batchId)
          val withDomain = survivors0.withColumn("domain",
            graft.functions.RegisteredDomain(
              regexp_extract(col("url_canon"), "^[a-z]+://([^/:]+)", 1)))
          val earlier = (0L until batchId).map(i => s"$countsDir/b$i")
            .filter(p => new java.io.File(p).exists())
          val prior =
            if (earlier.isEmpty) Seq.empty[(String, Long)].toDF("domain", "n")
            else spark.read.parquet(earlier: _*)
              .groupBy("domain").agg(sum("n").as("n"))
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("domain"))
            .orderBy(col("media_id"), col("record_idx"))
          val ranked = withDomain
            .withColumn("__r", row_number().over(w))
            .join(broadcast(prior), Seq("domain"), "left")
            .withColumn("domain_rank",
              (col("__r") + coalesce(col("n"), lit(0L))).cast("long"))
          ranked.where(col("domain_rank") <= domainCap)
            .select(col("media_id"), col("record_idx"), col("carrier"),
              col("url_canon").as("url"), col("domain"), col("domain_rank"),
              col("text"))
            .write.mode("overwrite").parquet(s"$outDir/b$batchId")
          writeKeys(gated, urlKept, s"$keysDir/b$batchId")
          // UNCAPPED per-domain survivor counts — this batch's alone
          withDomain.groupBy("domain").agg(count(lit(1)).as("n"))
            .write.mode("overwrite").parquet(s"$countsDir/b$batchId")
        } finally { gated.unpersist(); () }
      }
      .start()
  }
}
