package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-statistics quality scoring — a unigram language-model
  * rarity score per document, the two-pass cousin of the per-row
  * heuristics in `TextFunctions.qualityScore`: pass 1 aggregates the
  * corpus unigram counts (the "model"), pass 2 scores every document
  * against them. This is the CCNet/Gopher-style "perplexity-ish"
  * filter signal, kept in EXACT integer arithmetic so two engines
  * agree bit-for-bit: a token's rarity is `floor(log2(total/count))`
  * computed as `length(bin(total div count)) - 1` — binary-string
  * length, no floating log anywhere. A stopword ("the") scores ~2-4
  * bits, a hapax scores ~log2(corpus) bits; a document's score is the
  * sum over token OCCURRENCES (so repeated rare tokens keep adding
  * surprise), reported with its token count and a rounded average.
  *
  * Scale shape: the vocab aggregation is a hash-partial groupBy (one
  * shuffle of (token, partial-count) pairs); the score pass joins
  * tokens to vocab — `broadcastVocab = false` (default) plans it as a
  * shuffle hash join keyed on the token, the right call at 100 TB
  * where the unigram vocab is itself hundreds of millions of rows;
  * `true` broadcasts a known-small vocab and keeps the score pass
  * map-only. Zero-token documents survive via the final LEFT JOIN
  * from the input (score 0, null average) — dropping them would
  * silently conflate "empty" with "filtered".
  */
object UnigramLM {

  /** One row per input document: `idCol, n_tok, rarity_sum,
    * rarity_avg` (avg = ROUND(sum/n, 4), null when n_tok = 0).
    * Tokenization matches the wordcount surface: lowercase,
    * single-space split, empty tokens dropped. */
  def raritySignals(df: DataFrame, idCol: String, textCol: String,
                    broadcastVocab: Boolean = false): DataFrame = {
    // widen narrow scans first: the tokenize+explode pass is the
    // CPU-bound map stage, and a one-file input would run it on one
    // task (the q64 lesson — Engine.widen no-ops once splits >= slots).
    // Persisted because the plan reads it three times (vocab agg,
    // scalar total, score join) and Spark does not dedup common
    // subplans — without the cache the most expensive stage would run
    // 3×. Blocks are freed by the ContextCleaner when the returned
    // frame is collected (the minHashCandidates lifecycle contract).
    val toks = graft.core.Engine.widen(df)
      .select(col(idCol), explode(split(lower(col(textCol)), " ")).as("__tok"))
      .where(col("__tok") =!= "")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab0 = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__cnt"))
    val vocab = if (broadcastVocab) broadcast(vocab0) else vocab0
    // corpus total as a 1-row broadcast (sum of vocab counts == token
    // occurrences) — keeps the scalar in-plan, no driver round-trip
    val total = broadcast(vocab0.agg(sum(col("__cnt")).as("__total")))
    val scored = toks
      .join(vocab, "__tok")
      .crossJoin(total)
      // floor(log2(total/cnt)) as a binary-string length: integers end
      // to end, so DuckDB's bin() and Spark's bin() agree exactly
      .withColumn("__rar", (length(bin(expr("__total div __cnt"))) - 1).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"), sum(col("__rar")).as("rarity_sum"))
    Guards.uniqueIdBase(df, idCol, "UnigramLM.raritySignals")
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        coalesce(col("rarity_sum"), lit(0L)).as("rarity_sum"),
        when(coalesce(col("n_tok"), lit(0L)) > 0,
          round(col("rarity_sum").cast("double") / col("n_tok"), 4)).as("rarity_avg"))
  }
}
