package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative BPE merge learning (Sennrich et al. 2016) — the
  * tokenizer-training step of the pipeline, run distributed over the
  * DISTINCT-word frequency table (q108's scale argument: every pass
  * costs one job over the vocabulary, 10⁵–10⁷ rows, never the corpus).
  *
  * Each round: count adjacent symbol pairs weighted by word frequency
  * (one partial-agg shuffle), pick the global argmax (freq desc, then
  * lexicographic pair — fully deterministic), fuse that pair in every
  * word's symbol array, repeat. The fuse is a left fold over the
  * symbol array (`aggregate` HOF): append, or replace the last
  * element when (last, current) == (a, b). Left-to-right greedy
  * non-overlap falls out of the fold — after fusing, the last element
  * is `a+b`, which can never equal `a` again (b is non-empty), so
  * "aaa" under merge (a,a) yields [aa, a], exactly the sequential
  * semantics of the reference algorithm.
  *
  * The evolving vocabulary is persisted per round and the previous
  * round's cache freed (the `Dedup.components` loop discipline) — the
  * lineage would otherwise re-run every earlier fuse each round.
  */
object BpeTrainer {

  /** One learned merge: the pair and its weighted frequency at the
    * round it was chosen. */
  final case class Merge(a: String, b: String, freq: Long)

  /** Character symbols of a word. Spark's `split(str, "")` runs Java
    * split with limit -1, which KEEPS a trailing empty match — filter
    * it, or a phantom "" symbol joins every pair count. */
  private def chars(word: Column): Column =
    filter(split(word, ""), s => s =!= lit(""))

  /** Fuse adjacent (a, b) into a+b, left-to-right greedy. */
  private[llm] def fuse(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, lit(-1)) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Learn up to `nMerges` merges from a (word, count) table. Words
    * start as single-character symbol arrays (codepoint split). Stops
    * early when no adjacent pair is left (every word fused to one
    * symbol). Deterministic: ties on frequency break lexicographically
    * on (a, b). */
  def learnMerges(words: DataFrame, wordCol: String, countCol: String,
                  nMerges: Int): Seq[Merge] = {
    require(nMerges >= 0, s"BpeTrainer: nMerges must be >= 0: $nMerges")
    var cur = words
      .select(chars(col(wordCol)).as("syms"), col(countCol).cast("long").as("__c"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val merges = Seq.newBuilder[Merge]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      // length-1 words are fenced BEFORE the transform: sequence(1, 0)
      // counts DOWN in Spark, it does not produce empty
      val top = cur.where(size(col("syms")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(syms) - 1), i -> struct(syms[i-1] AS a, syms[i] AS b))"))
          .as("p"), col("__c"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("__c")).as("freq"))
        .orderBy(desc("freq"), col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(a, b, f)
        val next = cur.select(fuse(col("syms"), a, b).as("syms"), col("__c"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count() // materialize before freeing the parent's blocks
        cur.unpersist()
        cur = next
        round += 1
      }
    }
    cur.unpersist()
    merges.result()
  }

  /** Segment words with an already-learned merge list (the tokenize
    * step for NEW text): apply each merge in learned order — the same
    * greedy fold, chained. Plan depth grows with the merge count, so
    * this column is for modest merge lists (specs, analysis); a
    * production tokenizer bakes the final merge table into a
    * single-pass matcher. */
  def segment(word: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(chars(word).as("syms")) { (acc, m) => fuse(acc, m.a, m.b) }

  /** The production tokenize path: identical sequential-greedy
    * semantics as [[segment]] (differential-spec-pinned), but the
    * whole merge table lives inside ONE native expression — plan
    * depth O(1) at any table size, merges that can't fire skip in
    * O(1). Use this for real merge tables (thousands of rounds);
    * `segment` stays as the column-tier executable specification. */
  def segmentFast(word: Column, merges: Seq[Merge]): Column =
    graft.functions.BpeSegment(word, merges.map(m => (m.a, m.b)))
}
