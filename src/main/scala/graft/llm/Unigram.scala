package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (the SentencePiece family) — the
  * OTHER major subword algorithm next to [[BpeTrainer]]: seed a
  * candidate vocabulary from substring statistics, then run hard-EM
  * rounds where the E-step Viterbi-segments every word with the
  * current vocabulary and the M-step re-counts piece usage. This
  * implementation keeps every step integer-exact (the
  * [[graft.functions.UnigramSegment]] objective) so the whole
  * trainer replays in the DuckDB oracle.
  *
  * Scale posture (the q108 lesson): everything runs over the
  * DISTINCT-WORD table weighted by word count — substring explosion
  * and segmentation cost scale with the vocabulary (10⁵–10⁷ rows),
  * never the corpus token count (10¹²). The candidate vocabulary is
  * bounded (topK + alphabet), so it broadcasts into the segmenter as
  * instance state — the E-step is map-only, one shuffle for the
  * M-step usage aggregation. */
object Unigram {

  /** Seed vocabulary: every single character (coverage) plus the
    * topK substrings of length 2..maxPieceLen by corpus frequency
    * (count-weighted, all occurrences incl. overlaps), ties to the
    * lexicographically first piece. Deterministic. */
  def seedVocab(words: DataFrame, wordCol: String, countCol: String,
                maxPieceLen: Int = 4, topK: Int = 200,
                minFreq: Long = 2L): DataFrame = {
    val subs = (2 to maxPieceLen).map { len =>
      words.where(length(col(wordCol)) >= len)
        .select(explode(expr(
          s"transform(sequence(1, length($wordCol) - ${len - 1}), " +
            s"i -> substring($wordCol, i, $len))")).as("piece"),
          col(countCol).as("c"))
    }.reduce(_ unionAll _)
      .groupBy(col("piece")).agg(sum(col("c")).as("freq"))
      .where(col("freq") >= minFreq)
      .orderBy(desc("freq"), asc("piece"))
      .limit(topK)
    val chars = words
      .select(explode(expr(
        s"transform(sequence(1, length($wordCol)), " +
          s"i -> substring($wordCol, i, 1))")).as("piece"),
        col(countCol).as("c"))
      .groupBy(col("piece")).agg(sum(col("c")).as("freq"))
    chars.unionAll(subs).select(col("piece"), col("freq"))
  }

  /** The E-step segmenter column (vocab baked in — plan depth O(1)). */
  def segment(word: Column, vocab: Seq[(String, Long)]): Column =
    graft.functions.UnigramSegment(word, vocab)

  /** One hard-EM round's M-step counts: Viterbi-segment every word
    * with `vocab`, count piece usage weighted by word count plus the
    * number of distinct words using each piece. One map-only E-step,
    * one aggregation shuffle. */
  def usageCounts(words: DataFrame, wordCol: String, countCol: String,
                  vocab: Seq[(String, Long)]): DataFrame =
    words
      .select(col(wordCol).as("w"), col(countCol).as("c"),
        explode(segment(col(wordCol), vocab)).as("piece"))
      .groupBy(col("piece"))
      .agg(sum(col("c")).as("usage"),
        countDistinct(col("w")).as("n_words"))
}
