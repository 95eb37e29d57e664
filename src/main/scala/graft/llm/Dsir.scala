package graft.llm

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection with importance resampling (Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling"): score every raw document by how much more likely its
  * hashed n-gram features are under a TARGET domain than under the
  * raw corpus, then keep/sample by that importance weight — the
  * principled replacement for a binary quality classifier when the
  * goal is "make the corpus look like the target distribution".
  *
  * Feature space: distinct per-document token FNV-64 hashes (the
  * [[graft.functions.ShingleHashes]] n=1 native pass q230 uses)
  * folded into `buckets` cells — the hashed-feature trick again, so
  * the learned weight table is `buckets` integers at ANY vocabulary.
  * Per bucket, the weight is the smoothed log-likelihood ratio
  *   w(b) = ln((t_b+1)/(T+B)) − ln((r_b+1)/(R+B))
  * scaled to integer 1e-4 units (one ROUND per bucket — after that
  * every per-document sum is exact integer arithmetic, order-free,
  * replayed verbatim by the q236 DuckDB oracle).
  *
  * Scale posture: two feature-count aggregates (target, raw — each
  * one partial-agg shuffle of (bucket) keys), a `buckets`-row weight
  * frame that BROADCASTS to the scoring join, and one per-document
  * aggregate. Raw text is scanned twice (count pass + score pass) —
  * at 100 TB callers should persist the exploded feature frame or
  * score incrementally per ingest batch against a saved weight table
  * ([[weights]] output is a plain DataFrame — write it once, reuse). */
object Dsir {

  /** (doc_id, b): one row per distinct feature hash per document,
    * bucketed. */
  private def features(df: DataFrame, idCol: String, textCol: String,
                       buckets: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(graft.functions.SketchExpressions
          .shingleHashes64(col(textCol), 1)).as("__h"))
      .select(col("doc_id"), pmod(col("__h"), lit(buckets.toLong)).as("b"))

  /** Per-bucket importance weights in integer 1e-4 units:
    * (b, t_c, r_c, w_e4) over the full bucket spine (absent buckets
    * carry the smoothing-only weight). */
  def weights(raw: DataFrame, target: DataFrame, idCol: String,
              textCol: String, buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, s"Dsir: buckets must be >= 2: $buckets")
    val spark = raw.sparkSession
    val tc = features(target, idCol, textCol, buckets)
      .groupBy("b").agg(count(lit(1)).as("t_c"))
    val rc = features(raw, idCol, textCol, buckets)
      .groupBy("b").agg(count(lit(1)).as("r_c"))
    val spine = spark.range(buckets).select(col("id").as("b"))
    val joined = spine
      .join(tc, Seq("b"), "left").join(rc, Seq("b"), "left")
      .select(col("b"),
        coalesce(col("t_c"), lit(0L)).as("t_c"),
        coalesce(col("r_c"), lit(0L)).as("r_c"))
      // totals as windows over the <= `buckets`-row frame (the q225
      // marginal idiom — no second aggregate job)
      .withColumn("__t", expr("SUM(t_c) OVER ()"))
      .withColumn("__r", expr("SUM(r_c) OVER ()"))
    joined.select(col("b"), col("t_c"), col("r_c"),
      round((
        log((col("t_c") + 1).cast("double") /
          (col("__t") + buckets).cast("double")) -
        log((col("r_c") + 1).cast("double") /
          (col("__r") + buckets).cast("double"))) * 1e4)
        .cast("long").as("w_e4"))
  }

  /** Score documents against a weight table: (doc_id, n_feat,
    * score_e4) — the importance score is the exact integer sum of the
    * document's distinct features' bucket weights. Documents with no
    * features score null. `wts` broadcasts (it is `buckets` rows). */
  def score(df: DataFrame, wts: DataFrame, idCol: String,
            textCol: String, buckets: Int = 1024): DataFrame = {
    val scored = features(df, idCol, textCol, buckets)
      .join(broadcast(wts.select(col("b"), col("w_e4"))), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feat"), sum("w_e4").as("score_e4"))
    df.select(col(idCol).as("doc_id")).distinct()
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feat"), lit(0L)).as("n_feat"), col("score_e4"))
  }
}
