package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-substring extents — the Lee et al. 2022
  * ("Deduplicating Training Data Makes Language Models Better")
  * operational rule: any span of at least `minRun` consecutive tokens
  * that occurs verbatim MORE THAN ONCE in the corpus (in another
  * document or at another position of the same one) is duplicated
  * text, reported as maximal per-document integer extents. Winnowing
  * (q70/q71) finds *approximate* shared substrings from sampled
  * fingerprints; this is the exact variant with zero recall loss at
  * the declared granularity.
  *
  * Where the paper builds a corpus-wide suffix array (their §4,
  * ~8 bytes/token driver-side state), the Spark-first equivalence is:
  * a span of length ≥ minRun repeats verbatim  ⟺  every length-minRun
  * window inside it repeats verbatim  ⟺  every window-start position
  * in the span carries a gram whose corpus-wide occurrence count is
  * ≥ 2. So the whole computation is (1) one windowed projection to
  * per-position grams, (2) one hash-aggregate occurrence count —
  * map-side combined, carrying md5(gram) instead of the k words, so
  * the exchange is 16 bytes/position regardless of minRun — (3) one
  * join back, (4) a per-document gaps-and-islands merge of the
  * surviving positions (idx − row_number island key). Three shuffles
  * total (gram count, join back, per-doc window), each on bounded-
  * width rows; no suffix array, no driver-side state, no all-pairs.
  *
  * The md5 keying is exact up to md5 collisions (no verbatim check is
  * done on the 16-byte key; at 2⁻¹²⁸ per pair this is the standard
  * content-address assumption, same as [[Dedup]]'s history index).
  *
  * Positions are 1-based indices over the document's NON-EMPTY
  * whitespace tokens (renumbered, so runs of spaces cannot split an
  * extent), `end_idx` inclusive; every extent satisfies
  * `end_idx − start_idx + 1 ≥ minRun` by construction. The
  * definition is replayed verbatim by a DuckDB oracle (q217) and a
  * naive quadratic reference (ExactSubstringSpec).
  */
object ExactSubstring {

  private val byIdx = Window.partitionBy(col("doc_id")).orderBy(col("idx"))

  /** Fused per-document token+gram rows (optimization r20):
    * (doc_id, idx, w, gh) — idx 1-based over non-empty single-space
    * tokens, gh the 16-byte digest of the length-`minRun` gram
    * starting at idx (null past the last full window). One
    * [[graft.functions.TokenGrams]] map pass replaces the r19
    * row-number window + minRun−1 lead windows, which shuffled and
    * SORTED every token row twice before the first real aggregate —
    * positions and grams are per-document facts, so they now ride
    * the scan (widened for small inputs: the r19 docIds lesson). */
  private def tokenGramRows(df: DataFrame, idCol: String, textCol: String,
                            minRun: Int): DataFrame =
    graft.core.Engine.widen(df)
      .select(col(idCol).as("doc_id"),
        posexplode(graft.functions.TokenGrams(col(textCol), minRun))
          .as(Seq("p0", "tg")))
      .select(col("doc_id"), (col("p0") + 1).as("idx"),
        col("tg").getField("w").as("w"), col("tg").getField("gh").as("gh"))

  /** Window starts whose gram repeats corpus-wide (any second verbatim
    * occurrence, same doc or another — the paper's rule), with their
    * gaps-and-islands key: consecutive duplicated starts share
    * (idx − row_number), each island is one maximal extent. */
  private def dupStarts(g: DataFrame): DataFrame = {
    val dup = g.groupBy("gh").agg(count(lit(1)).as("occ"))
      .where(col("occ") >= 2).select("gh")
    g.join(dup, "gh")
      .withColumn("island", col("idx") - row_number().over(byIdx))
  }

  /** Maximal duplicated extents: (doc_id, start_idx, end_idx,
    * n_words). See the object doc for the exact definition. */
  def duplicatedExtents(df: DataFrame, idCol: String, textCol: String,
                        minRun: Int): DataFrame = {
    require(minRun >= 2, s"minRun must be >= 2, got $minRun")
    dupStarts(tokenGramRows(df, idCol, textCol, minRun)
        .where(col("gh").isNotNull).select(col("doc_id"), col("idx"), col("gh")))
      .groupBy(col("doc_id"), col("island"))
      .agg(min("idx").as("start_idx"),
        (max("idx") + lit(minRun - 1)).as("end_idx"))
      .select(col("doc_id"), col("start_idx"), col("end_idx"),
        (col("end_idx") - col("start_idx") + 1).as("n_words"))
  }

  /** Surgical removal — the second half of the Lee et al. pipeline:
    * drop every duplicated extent EXCEPT its canonical copy, so one
    * occurrence of repeated text survives the scrub.
    *
    * Canonical rule (deterministic, local per extent): an extent is
    * kept iff its anchor position — (doc_id, start_idx) — is the
    * corpus-minimum (doc_id, idx) occurrence of its FIRST gram. Every
    * other extent's closed [start_idx, end_idx] token span is removed.
    * The leading-gram minimum holder always keeps its extent, so the
    * extent's leading region survives somewhere; a mid-extent overlap
    * in another document resolves against that document (its own
    * anchor decides its own extent). Self-repeats keep their first
    * occurrence: overlapping same-doc repetitions merge into one
    * island and survive intact, disjoint ones lose the later copy.
    *
    * Output per document: (doc_id, n_words, n_removed, text_md5) —
    * the scrubbed text is re-joined with single spaces in idx order
    * and witnessed by md5, so engines must agree on the exact kept
    * token sequence, not just counts. Scale shape: everything is the
    * extents pipeline plus one broadcast-size canonical lookup per
    * anchor gram, one per-doc range array (extents per doc, not
    * tokens), and one per-doc aggregate; tokens shuffle once. */
  def scrub(df: DataFrame, idCol: String, textCol: String,
            minRun: Int): DataFrame =
    flaggedTokens(df, idCol, textCol, minRun).groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("drop"), 1L).otherwise(0L)).as("n_removed"),
        md5(array_join(transform(
          array_sort(collect_list(when(!col("drop"),
            struct(col("idx"), col("w"))))),
          x => x.getField("w")), " ").cast("binary")).as("text_md5"))

  /** The scrubbed corpus itself — same removal rule as [[scrub]] but
    * returning the kept text for downstream stages (re-chunk,
    * re-pack: the curation-v5 composition): (doc_id, text, n_kept,
    * n_removed). `text` re-joins the kept tokens with single spaces
    * in idx order ('' for a fully-scrubbed document — callers decide
    * whether an empty survivor stays in the corpus). */
  def scrubText(df: DataFrame, idCol: String, textCol: String,
                minRun: Int): DataFrame =
    flaggedTokens(df, idCol, textCol, minRun).groupBy("doc_id")
      .agg(array_join(transform(
          array_sort(collect_list(when(!col("drop"),
            struct(col("idx"), col("w"))))),
          x => x.getField("w")), " ").as("text"),
        sum(when(col("drop"), 0L).otherwise(1L)).as("n_kept"),
        sum(when(col("drop"), 1L).otherwise(0L)).as("n_removed"))

  /** Shared body of [[scrub]]/[[scrubText]]: every token flagged with
    * whether the removal rule drops it: (doc_id, idx, w, drop). */
  private def flaggedTokens(df: DataFrame, idCol: String, textCol: String,
                            minRun: Int): DataFrame = {
    require(minRun >= 2, s"minRun must be >= 2, got $minRun")
    // ONE cached frame serves both the token view and the gram view
    // (r19 cached them separately — two columnar caches of the same
    // rows)
    val rows = tokenGramRows(df, idCol, textCol, minRun)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val toks = rows.select(col("doc_id"), col("idx"), col("w"))
    val g = rows.where(col("gh").isNotNull)
      .select(col("doc_id"), col("idx"), col("gh"))
    val extents = dupStarts(g)
      .groupBy(col("doc_id"), col("island"))
      .agg(min("idx").as("start_idx"), (max("idx") + lit(minRun - 1)).as("end_idx"))
      .drop("island")
    // canonical occurrence of each gram that anchors some extent
    val canon = g.groupBy("gh")
      .agg(min(struct(col("doc_id"), col("idx"))).as("__c"))
      .select(col("gh"), col("__c.doc_id").as("c_doc"), col("__c.idx").as("c_idx"))
    val anchored = extents
      .join(g.withColumnRenamed("idx", "start_idx"), Seq("doc_id", "start_idx"))
      .join(canon, "gh")
    val removed = anchored
      .where(col("c_doc") =!= col("doc_id") || col("c_idx") =!= col("start_idx"))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("start_idx"), col("end_idx"))).as("rs"))
    toks.join(removed, Seq("doc_id"), "left")
      .withColumn("drop", col("rs").isNotNull && exists(col("rs"),
        r => col("idx").between(r.getField("start_idx"), r.getField("end_idx"))))
  }
}
