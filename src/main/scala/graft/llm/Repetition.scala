package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Gopher/MassiveText-style intra-document repetition signals — the
  * quality-filter family a training-data pipeline runs before dedup:
  * heavily repetitive documents (boilerplate navigation, SEO spam,
  * templated pages) show up as a high fraction of repeated lines or
  * repeated n-grams and get dropped (Rae et al. 2021, appendix A1.1).
  *
  * Every signal is intra-document, so the whole computation is
  * MAP-ONLY: one fused native expression
  * ([[graft.functions.RepetitionStats]]) splits, builds n-grams and
  * counts frequencies per row in plain JVM code. No explode, no
  * shuffle, no state beyond one row — the alternative explode +
  * two-level groupBy ships ~(lines + topN + dupN)× the corpus bytes
  * through an exchange (n-grams multiply text ~n-fold), which at
  * 100 TB makes a quality SCAN cost more than the dedup it gates; and
  * the Column-tier fold (`transform`/`slice`/`aggregate`) evaluates
  * interpreted, measured ~3.5× slower at sf0.1.
  *
  * Definitions (fractions of `length(text)` unless noted):
  *  - `n_lines`: non-empty trimmed lines (split on `\n`).
  *  - `dup_line_frac`: `1 - distinct_lines / n_lines` — the fraction
  *    of lines that are repeats of an earlier line.
  *  - `dup_line_char_frac`: characters inside lines occurring more
  *    than once (all occurrences), over text length.
  *  - `top_ngram_char_frac`: characters covered by the single
  *    `topN`-gram with the greatest `count × length` coverage.
  *  - `dup_ngram_char_frac`: characters inside `dupN`-grams occurring
  *    more than once, over text length. Overlapping occurrences are
  *    each counted (an upper bound on Gopher's non-overlapping cover;
  *    the filter direction is the same).
  *
  * A document with no units at all (empty/whitespace text) still
  * yields a row, with zero counts — quality filtering must SEE empty
  * documents, not silently lose them.
  */
object Repetition {

  /** Raw integer counts behind [[signals]] — `idCol, chars, n_lines,
    * distinct_lines, dup_line_chars, top_gram_cover, dup_gram_chars`.
    * Use THIS tier for filter gates that must reproduce bit-for-bit
    * across engines (integer comparisons like
    * `dup_gram_chars * 10 < chars * 3` never hit double rounding —
    * the q50 lesson). */
  def stats(df: DataFrame, idCol: String, textCol: String,
            topN: Int = 2, dupN: Int = 5): DataFrame = {
    require(topN >= 1 && dupN >= 1, s"n-gram sizes must be >= 1: $topN, $dupN")
    val text = col(textCol)
    val st = ColumnBridge.column(graft.functions.RepetitionStats(
      ColumnBridge.expression(text), topN, dupN))
    // the per-row fold is the cost — spread a few-split scan first
    graft.core.Engine.widen(df)
      .select(col(idCol), length(text).cast("long").as("chars"), st.as("__st"))
      .select(col(idCol), col("chars"), col("__st.n_lines").as("n_lines"),
        col("__st.distinct_lines").as("distinct_lines"),
        col("__st.dup_line_chars").as("dup_line_chars"),
        col("__st.top_gram_cover").as("top_gram_cover"),
        col("__st.dup_gram_chars").as("dup_gram_chars"))
  }

  /** Per-document repetition signals for `df(textCol)`, keyed by
    * `idCol`. Returns `idCol, n_lines, dup_line_frac,
    * dup_line_char_frac, top_ngram_char_frac, dup_ngram_char_frac`
    * (raw doubles — callers round for display/compare). */
  def signals(df: DataFrame, idCol: String, textCol: String,
              topN: Int = 2, dupN: Int = 5): DataFrame =
    stats(df, idCol, textCol, topN, dupN)
      .select(col(idCol), col("n_lines"),
        ((col("n_lines") - col("distinct_lines")).cast("double") /
          greatest(col("n_lines"), lit(1L))).as("dup_line_frac"),
        (col("dup_line_chars").cast("double") /
          greatest(col("chars"), lit(1L))).as("dup_line_char_frac"),
        (col("top_gram_cover").cast("double") /
          greatest(col("chars"), lit(1L))).as("top_ngram_char_frac"),
        (col("dup_gram_chars").cast("double") /
          greatest(col("chars"), lit(1L))).as("dup_ngram_char_frac"))
}
