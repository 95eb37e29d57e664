package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Train/eval decontamination — the pipeline step that keeps
  * benchmark answers out of the training set: flag every training
  * document sharing at least one word `n`-gram with an evaluation
  * corpus (the n-gram–overlap criterion of GPT-3 appendix C /
  * PaLM-style decontamination; exact-substring variants differ only
  * in the unit).
  *
  * Scale shape: the eval side is DISTINCT n-grams only — benchmarks
  * are tiny next to a 100 TB corpus, so `broadcastEval = true`
  * (default) ships them to every executor and the train scan never
  * shuffles; each task hash-probes its documents' grams locally. For
  * an eval side too big to broadcast, `broadcastEval = false` plans
  * the same join as a shuffle on the gram key, with AQE handling hot
  * boilerplate grams.
  *
  * Returns one row per train document: `idCol, n_overlap,
  * contaminated` — the count of distinct shared grams and the flag,
  * 0/false for clean documents (every train id appears; dropping
  * clean docs silently would invert the operation's purpose).
  */
object Decontamination {

  def overlapFlags(train: DataFrame, eval0: DataFrame,
                   idCol: String, textCol: String, n: Int,
                   broadcastEval: Boolean = true): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1: $n")
    val trainGrams = train.select(col(idCol),
      explode(TextFunctions.wordShingles(col(textCol), n)).as("__g"))
    val evalGrams0 = eval0
      .select(explode(TextFunctions.wordShingles(col(textCol), n)).as("__g"))
      .distinct()
    val evalGrams = if (broadcastEval) broadcast(evalGrams0) else evalGrams0
    // wordShingles is distinct per document, so plain count = the
    // number of DISTINCT shared grams
    val overlaps = trainGrams.join(evalGrams, "__g")
      .groupBy(idCol).agg(count(lit(1)).as("n_overlap"))
    // idCol must be unique in `train`: duplicates would pool their
    // grams in the groupBy above and fan out the left join below —
    // fail loudly in-plan (same contract as Packing.packSequences).
    // The id projection shuffles for the join anyway; the pre-agg adds
    // only a map-side partial pass over the slim (id) column.
    val base = train.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
      .select(when(col("__n") > 1L, raise_error(concat(
          lit(s"Decontamination.overlapFlags: duplicate $idCol in train: "),
          col(idCol).cast("string"))))
        .otherwise(col(idCol)).as(idCol))
    base
      .join(overlaps, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) > 0).as("contaminated"))
  }
}
