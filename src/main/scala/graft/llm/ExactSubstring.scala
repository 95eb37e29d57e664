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

  /** Maximal duplicated extents: (doc_id, start_idx, end_idx,
    * n_words). See the object doc for the exact definition. */
  def duplicatedExtents(df: DataFrame, idCol: String, textCol: String,
                        minRun: Int): DataFrame = {
    require(minRun >= 2, s"minRun must be >= 2, got $minRun")
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    // non-empty tokens, renumbered contiguously per document
    val toks = df
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))
      .where(col("w") =!= "")
      .withColumn("idx", row_number().over(byDoc))
    // the length-minRun gram STARTING at each idx; md5 keeps the
    // count-stage exchange at 16 bytes/position independent of minRun
    val byIdx = Window.partitionBy(col("doc_id")).orderBy(col("idx"))
    val lastW = lead(col("w"), minRun - 1).over(byIdx)
    val gramCols = col("w") +: (1 until minRun).map(i => lead(col("w"), i).over(byIdx))
    val grams = toks
      .withColumn("last", lastW)
      .withColumn("gh", md5(concat_ws(" ", gramCols: _*)))
      .where(col("last").isNotNull)
      .select(col("doc_id"), col("idx"), col("gh"))
    // corpus-wide occurrence count ≥ 2 — any second verbatim
    // occurrence, same doc or another (the paper's rule)
    val dup = grams.groupBy("gh").agg(count(lit(1)).as("occ"))
      .where(col("occ") >= 2).select("gh")
    // gaps-and-islands: consecutive duplicated window-starts share
    // (idx − row_number), each island is one maximal extent
    val marked = grams.join(dup, "gh")
      .withColumn("island", col("idx") - row_number().over(byIdx))
    marked.groupBy(col("doc_id"), col("island"))
      .agg(min("idx").as("start_idx"),
        (max("idx") + lit(minRun - 1)).as("end_idx"))
      .select(col("doc_id"), col("start_idx"), col("end_idx"),
        (col("end_idx") - col("start_idx") + 1).as("n_words"))
  }
}
