package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher/MassiveText-style intra-document repetition signals — the
  * quality-filter family a training-data pipeline runs before dedup:
  * heavily repetitive documents (boilerplate navigation, SEO spam,
  * templated pages) show up as a high fraction of repeated lines or
  * repeated n-grams and get dropped (Rae et al. 2021, appendix A1.1).
  *
  * All signals are computed in ONE corpus scan: every document emits
  * one tagged unit list (its lines, its `topN`-grams, its
  * `dupN`-grams), a single explode + two hash aggregations (both with
  * map-side partial aggregation) produce per-(doc, kind, unit) counts
  * and then per-doc fractions. No joins, no window over the corpus —
  * the shape scales to arbitrarily many documents, and a single
  * pathological document costs O(its units) rows spread across the
  * (doc, kind, unit) shuffle, not a single straggler task.
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
  */
object Repetition {

  /** Per-document repetition signals for `df(textCol)`, keyed by
    * `idCol`. Returns `idCol, n_lines, dup_line_frac,
    * dup_line_char_frac, top_ngram_char_frac, dup_ngram_char_frac`
    * (raw doubles — callers round for display/compare). */
  def signals(df: DataFrame, idCol: String, textCol: String,
              topN: Int = 2, dupN: Int = 5): DataFrame = {
    require(topN >= 1 && dupN >= 1, s"n-gram sizes must be >= 1: $topN, $dupN")
    val text = col(textCol)
    def nonEmpty(arr: Column) = filter(arr, (x: Column) => x =!= "")
    val lines = nonEmpty(transform(split(text, "\n"), l => trim(l)))
    val words = nonEmpty(split(text, "\\s+"))
    // contiguous word n-grams; sequence(1,0) would run DOWNWARD in
    // Spark, so the short-document case needs the explicit empty arm
    def grams(n: Int): Column =
      if (n == 1) words
      else when(size(words) >= n,
        transform(sequence(lit(1), size(words) - (n - 1)),
          i => concat_ws(" ", slice(words, i, lit(n)))))
        .otherwise(array().cast("array<string>"))

    def tagged(kind: String, arr: Column) =
      transform(arr, u => struct(lit(kind).as("k"), u.as("u")))
    val units = concat(
      tagged("L", lines), tagged("T", grams(topN)), tagged("D", grams(dupN)))

    val isL = col("__k") === "L"
    val isT = col("__k") === "T"
    val isD = col("__k") === "D"
    val cover = col("__c") * col("__len") // chars covered by all occurrences
    df.select(col(idCol), length(text).cast("long").as("__chars"),
        explode(units).as("__unit"))
      .select(col(idCol), col("__chars"),
        col("__unit.k").as("__k"), col("__unit.u").as("__u"))
      .groupBy(idCol, "__chars", "__k", "__u")
      .agg(count(lit(1)).as("__c"))
      .withColumn("__len", length(col("__u")).cast("long"))
      .groupBy(idCol, "__chars")
      .agg(
        coalesce(sum(when(isL, col("__c"))), lit(0L)).as("n_lines"),
        coalesce(sum(when(isL, lit(1L))), lit(0L)).as("__dl"),
        coalesce(sum(when(isL && col("__c") > 1, cover)), lit(0L)).as("__dlc"),
        max(when(isT, cover).otherwise(0L)).as("__top"),
        coalesce(sum(when(isD && col("__c") > 1, cover)), lit(0L)).as("__dgc"))
      .select(col(idCol), col("n_lines"),
        ((col("n_lines") - col("__dl")).cast("double") /
          greatest(col("n_lines"), lit(1L))).as("dup_line_frac"),
        (col("__dlc").cast("double") /
          greatest(col("__chars"), lit(1L))).as("dup_line_char_frac"),
        (col("__top").cast("double") /
          greatest(col("__chars"), lit(1L))).as("top_ngram_char_frac"),
        (col("__dgc").cast("double") /
          greatest(col("__chars"), lit(1L))).as("dup_ngram_char_frac"))
  }
}
