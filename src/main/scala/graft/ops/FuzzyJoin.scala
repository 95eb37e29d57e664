package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance entity matching with blocking — the classic
  * record-linkage shape: NEVER the quadratic all-pairs distance, but
  * block (prefix) + band (length) first, so the expensive Levenshtein
  * runs only inside candidate buckets. Same discipline as the dedup
  * family's postings joins (`Dedup.ngramJaccardPairs`): the join key
  * bounds the cross product, the verify predicate bounds the output.
  *
  * The length band is itself a correctness filter, not just pruning:
  * |len(a) − len(b)| is a lower bound on edit distance, so any pair
  * outside `maxDist` length difference cannot match anyway.
  */
object FuzzyJoin {

  /** Distinct-value pairs (n1 < n2) within `maxDist` edits, blocked
    * on a `blockPrefix`-char prefix. Output: n1, n2, dist. Choose the
    * prefix length by value cardinality — 1 char makes ≤ alphabet
    * blocks (hot at corpus scale), 3–4 chars keeps blocks bounded for
    * name-like data. Pairs whose first `blockPrefix` chars differ are
    * not reported (the standard blocking trade-off — catch
    * mid-string typos, miss leading-char ones). */
  def pairs(df: DataFrame, nameCol: String, maxDist: Int,
            blockPrefix: Int = 1): DataFrame = {
    require(maxDist >= 0, s"FuzzyJoin: maxDist must be >= 0: $maxDist")
    require(blockPrefix >= 1, s"FuzzyJoin: blockPrefix must be >= 1: $blockPrefix")
    val names = df.select(col(nameCol).as("__n")).where(col("__n").isNotNull).distinct()
    val left = names.select(col("__n").as("n1"),
      substring(col("__n"), 1, blockPrefix).as("__b"))
    val right = names.select(col("__n").as("n2"),
      substring(col("__n"), 1, blockPrefix).as("__b"))
    left.join(right, "__b")
      .where(col("n1") < col("n2"))
      // cheap band prunes BEFORE the DP distance runs; then compute
      // the distance once, as a named column the filter reuses
      .where(abs(length(col("n1")) - length(col("n2"))) <= maxDist)
      .withColumn("dist", levenshtein(col("n1"), col("n2")).cast("long"))
      .where(col("dist") <= maxDist)
      .select(col("n1"), col("n2"), col("dist"))
  }
}
