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
    // the id projection shuffles for the join anyway; the unique-id
    // guard's pre-agg adds only a map-side pass over the slim column
    flagsFromOverlaps(train, overlaps, idCol, "Decontamination.overlapFlags")
  }

  /** The auditor's view of [[overlapFlags]]: one row per EVAL item —
    * how many distinct train documents share at least one n-gram
    * with it, how many of ITS grams leak, and the smallest offending
    * train id as a deterministic witness. `overlapFlags` answers
    * "which training docs must go"; this answers "which benchmark
    * items are compromised and how badly" — the report a model card
    * cites. Clean eval items keep their row (all-zero / null
    * witness).
    *
    * Scale shape: the eval grams broadcast WITH their ids (still
    * benchmark-tiny); the train scan probes them map-side, and the
    * only shuffle is the per-eval-item aggregate of (train id, gram)
    * pairs — bounded by matches, not corpus size. */
  def evalReport(train: DataFrame, eval0: DataFrame,
                 idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1: $n")
    val evalGrams = broadcast(eval0.select(col(idCol).as("__eid"),
      explode(TextFunctions.wordShingles(col(textCol), n)).as("__g")))
    val trainGrams = train.select(col(idCol).as("__tid"),
      explode(TextFunctions.wordShingles(col(textCol), n)).as("__g"))
    val hits = trainGrams.join(evalGrams, "__g")
      .groupBy("__eid")
      .agg(countDistinct(col("__tid")).as("n_train_hits"),
        countDistinct(col("__g")).as("n_shared_grams"),
        min(col("__tid")).as("first_hit"))
    eval0.select(col(idCol).as("__eid")).distinct()
      .join(hits, Seq("__eid"), "left")
      .select(col("__eid").as(idCol),
        coalesce(col("n_train_hits"), lit(0L)).as("n_train_hits"),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"),
        col("first_hit"),
        (coalesce(col("n_train_hits"), lit(0L)) > 0).as("leaked"))
  }

  /** SEMANTIC decontamination — the embedding-space sibling of the
    * n-gram paths: flag every corpus vector whose cosine similarity
    * to ANY eval-set vector reaches `threshold` (paraphrased benchmark
    * answers share no n-gram but sit next to the eval item in
    * embedding space). The comparison runs on the ROUNDED (4-place)
    * max similarity so a replaying engine makes the identical
    * keep/flag decision at the threshold boundary.
    *
    * Scale shape: the eval side BROADCASTS (benchmarks are thousands
    * of vectors against a corpus of billions) and the corpus scans
    * once — per task a map-only max over the broadcast set, then one
    * per-id partial-agg max; no shuffle carries vectors. An eval set
    * too big to broadcast should be pre-bucketed with the ANN tier
    * ([[Ivf]]/[[Similarity.lshBucket]]) and this run per probe
    * bucket. Output: (idCol, max_sim, contaminated) — one row per
    * corpus vector, clean rows kept (the [[overlapFlags]] posture). */
  def semanticFlags(corpus: DataFrame, evalSet: DataFrame,
                    idCol: String, vecCol: String,
                    threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"Decontamination.semanticFlags: threshold must be in (0, 1]: $threshold")
    val q = broadcast(evalSet.select(col(vecCol).as("__qe")))
    // LEFT outer against the broadcast eval side (condition `true`):
    // row-identical to a crossJoin for any non-empty eval set, but an
    // EMPTY eval set keeps every corpus row once with a null sim —
    // reported clean (max_sim 0.0) instead of silently erasing the
    // corpus. Same plan: one corpus scan, eval rides the broadcast.
    corpus.join(q, lit(true), "left")
      .select(col(idCol),
        graft.functions.VectorFunctions.cosine(col(vecCol), col("__qe")).as("__s"))
      .groupBy(idCol)
      .agg(coalesce(round(max("__s"), 4), lit(0.0)).as("max_sim"))
      .withColumn("contaminated", col("max_sim") >= threshold)
  }

  /** Shared result shaping for both decontamination paths: unique-id
    * guard ([[Guards.uniqueIdBase]]), left join so CLEAN documents
    * keep their row, counts coalesced to 0. */
  private def flagsFromOverlaps(train: DataFrame, overlaps: DataFrame,
                                idCol: String, opName: String): DataFrame =
    Guards.uniqueIdBase(train, idCol, opName)
      .join(overlaps, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) > 0).as("contaminated"))

  /** [[overlapFlags]] with a Bloom prefilter on the train side — the
    * 100 TB posture when overlap is rare (the common case: benchmark
    * grams are a vanishing fraction of a web corpus). The eval grams
    * build a Bloom filter DISTRIBUTED-side (`stat.bloomFilter` runs a
    * treeAggregate; only the merged bitset reaches the driver), which
    * then rides the plan as a constant probed by Spark's own
    * codegen'd `BloomFilterMightContain` — the same expression
    * Spark's runtime row-level filtering injects, fed the same
    * `xxhash64` it expects. Train grams that miss the filter (the
    * overwhelming majority) die in the scan stage and NEVER shuffle;
    * the surviving sliver goes through the exact join, so false
    * positives cannot reach the output and the result is
    * bit-identical to [[overlapFlags]] — the filter changes the
    * plan, not the answer.
    *
    * `expectedGrams`/`fpp` size the filter: at the default 1% fpp the
    * bitset is ~1.2 bytes per eval gram — a 10M-gram benchmark suite
    * is a ~12 MB plan constant, the same order as a broadcast of the
    * gram set itself but probed with zero join machinery. */
  def overlapFlagsBloom(train: DataFrame, eval0: DataFrame,
                        idCol: String, textCol: String, n: Int,
                        expectedGrams: Long = 1L << 20,
                        fpp: Double = 0.01): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1: $n")
    require(expectedGrams > 0, s"expectedGrams must be positive: $expectedGrams")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    val evalGrams = eval0
      .select(explode(TextFunctions.wordShingles(col(textCol), n)).as("__g"))
      .distinct()
    // build over xxhash64(gram) longs: stat.bloomFilter putLong's an
    // integral column, which is exactly what BloomFilterMightContain's
    // mightContainLong probe expects for its xxhash64'd value
    val bf = evalGrams.select(xxhash64(col("__g")).as("__h"))
      .stat.bloomFilter("__h", expectedGrams, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    val mightContain = org.apache.spark.sql.graft.ColumnBridge.column(
      BloomFilterMightContain(
        Literal(bos.toByteArray, org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.graft.ColumnBridge.expression(xxhash64(col("__g")))))
    val trainGrams = train.select(col(idCol),
        explode(TextFunctions.wordShingles(col(textCol), n)).as("__g"))
      .where(mightContain)
    val overlaps = trainGrams.join(broadcast(evalGrams), "__g")
      .groupBy(idCol).agg(count(lit(1)).as("n_overlap"))
    flagsFromOverlaps(train, overlaps, idCol, "Decontamination.overlapFlagsBloom")
  }
}
