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

  /** Result of [[train]]: the final (piece, weight) vocabulary, the
    * hard-EM rounds actually run, and whether they reached a fixed
    * point before `maxRounds`. */
  final case class TrainResult(vocab: Seq[(String, Long)], rounds: Int,
                               converged: Boolean)

  /** The full trainer — the convergence loop q323/q330 open, closed
    * (the [[graft.llm.Clustering.lloyd]] discipline): seed, then
    * iterate hard-EM rounds — E-step Viterbi-segments every distinct
    * word under the current weights, M-step re-estimates weights
    * from usage — with a VOCAB-SIZE SCHEDULE (SentencePiece's prune:
    * each round the multi-char vocabulary keeps the top
    * `max(targetMulti, ceil(current · shrink))` survivors by
    * (usage desc, piece), single chars always stay for coverage) —
    * until the vocabulary repeats EXACTLY (pieces AND weights).
    * Assignment is a pure function of the vocabulary and the next
    * vocabulary a pure function of the assignment, so a repeated
    * vocabulary is a fixed point: every later round reproduces it
    * verbatim — the integer-exact convergence test, no epsilon
    * (lloyd's argument, restated for tokenizers).
    *
    * Scale posture (the q108 contract): per round ONE map-only
    * E-step over the DISTINCT-WORD table + one partial-agg shuffle;
    * the only driver traffic is the O(chars + topK) usage collect
    * that becomes the next round's baked-in expression state —
    * vocabulary-sized, never corpus-sized. Plan depth is O(1) in the
    * round count BY CONSTRUCTION: every round plans fresh from
    * `words` with the vocab as literals (no chained lineage to cut —
    * spec-pinned in UnigramSpec). */
  def train(words: DataFrame, wordCol: String, countCol: String,
            maxPieceLen: Int = 4, topK: Int = 200, minFreq: Long = 2L,
            targetMulti: Int = 20, shrink: Double = 0.75,
            maxRounds: Int = 10): TrainResult = {
    require(maxRounds >= 1, s"train: maxRounds must be >= 1, got $maxRounds")
    require(shrink > 0 && shrink <= 1.0, s"train: shrink in (0,1], got $shrink")
    var vocab = seedVocab(words, wordCol, countCol, maxPieceLen, topK, minFreq)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    var rounds = 0
    var converged = false
    while (rounds < maxRounds && !converged) {
      val usage = usageCounts(words, wordCol, countCol, vocab)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val chars = vocab.filter(_._1.length == 1)
        .map { case (p, _) => (p, usage.getOrElse(p, 0L)) }
      val survivors = vocab.filter(_._1.length >= 2)
        .flatMap { case (p, _) => usage.get(p).map(u => (p, u)) }
        .sortBy { case (p, u) => (-u, p) }
      val nMulti = vocab.count(_._1.length >= 2)
      val keep = math.max(targetMulti, math.ceil(nMulti * shrink).toInt)
      val next = chars ++ survivors.take(keep)
      rounds += 1
      converged = next == vocab
      vocab = next
    }
    TrainResult(vocab, rounds, converged)
  }
}
