package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prefix-filtered EXACT set-similarity self-join — the PPJoin/
  * AllPairs prefix principle (Chaudhuri et al.'s SSJoin / Xiao et
  * al.'s PPJoin, both public): two token sets with Jaccard ≥ t must
  * share at least one token among each set's first
  * `n − ceil(t·n) + 1` tokens when every set is ordered by GLOBAL
  * token rarity (ascending document frequency). Joining only on
  * those prefix tokens is therefore COMPLETE — unlike MinHash-LSH
  * ([[Dedup.minHashVerifiedPairs]]) there is no recall loss — while
  * the join fan-out stays tiny because prefixes are, by
  * construction, each document's RAREST tokens.
  *
  * The threshold is a rational `num/den` and every keep decision is
  * integer arithmetic (`den·|A∩B| ≥ num·(|A|+|B|−|A∩B|)`): no double
  * compare can disagree between engines ([[graft.ops.Sampling]]'s
  * integer-rule discipline).
  *
  * Scale posture: token lists per document are bounded by document
  * vocabulary (thousands, not corpus-sized); the global df table
  * shuffles on token; the candidate join touches only prefix
  * postings — rare tokens with short postings lists — and the
  * verification join is restricted to candidate pairs (never
  * all-pairs). The rarity ordering is (df, token): fully
  * deterministic, so results are reproducible across engines and
  * runs.
  */
object SetSimJoin {

  /** Exact token-set Jaccard pairs at threshold `num/den`.
    *
    * `ngram = 1` compares lower-cased word SETS; `ngram ≥ 2` compares
    * word-shingle sets ([[graft.functions.TextFunctions.wordShingles]],
    * the q25/q27 gram family) — far more discriminative, which is what
    * keeps the exact answer tractable on template-heavy corpora whose
    * unigram sets form giant near-identical cliques.
    *
    * @return (id1, id2, inter, n1, n2) for every pair with
    *         den·inter ≥ num·(n1 + n2 − inter), id1 < id2
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   num: Int, den: Int, ngram: Int = 1): DataFrame = {
    require(num >= 1 && den >= 1 && num <= den,
      s"setSimJoin: threshold num/den must be in (0, 1]: $num/$den")
    require(ngram >= 1, s"setSimJoin: ngram must be >= 1: $ngram")
    // persisted: the tokenization (HOF shingles for ngram ≥ 2) feeds
    // the df table, the per-doc arrays AND both verification legs —
    // without the cache it would run 4×. Released by the
    // ContextCleaner when the result frame is collected/GC'd (the
    // Dedup.minHashCandidates lifecycle contract).
    val toks = (
      if (ngram == 1)
        df.select(col(idCol).as("id"),
            explode(split(lower(col(textCol)), " ")).as("tok"))
          .where(col("tok") =!= "").distinct()
      else
        df.select(col(idCol).as("id"),
          explode(graft.functions.TextFunctions
            .wordShingles(col(textCol), ngram)).as("tok"))
      ).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfc = toks.groupBy("tok").agg(count(lit(1)).as("dfc"))
    // per-document token array in (df asc, token asc) rarity order
    val docs = toks.join(dfc, "tok")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("dfc"), col("tok")))).as("arr"),
        count(lit(1)).as("n"))
    // prefix length n − ceil(t·n) + 1, ceil done in integer division
    val prefixLen = expr(s"CAST(n - ((n * $num + ${den - 1}) DIV $den) + 1 AS INT)")
    val prefix = docs
      .select(col("id"), col("n"),
        posexplode(slice(col("arr").getField("tok"), lit(1), prefixLen))
          .as(Seq("p0", "tok")))
      .select(col("id"), col("n"), (col("p0") + 1).as("p"), col("tok"))
    // candidate pruning beyond the shared-prefix-token requirement —
    // both are the standard PPJoin filters and both are COMPLETE
    // (they only discard pairs that provably cannot reach t):
    //  · length filter: |A| and |B| within factor t of each other
    //  · positional filter: tokens matched at prefix positions pa/pb
    //    leave at most min(n1−pa, n2−pb)+1 possible overlaps, which
    //    must reach alpha = ceil(num·(n1+n2)/(num+den))
    // On low-cardinality vocabularies (where every token is common and
    // the prefix principle alone prunes nothing) these cut the
    // candidate set by orders of magnitude.
    val a = prefix.select(col("id").as("id1"), col("n").as("n1"),
      col("p").as("pa"), col("tok"))
    val b = prefix.select(col("id").as("id2"), col("n").as("n2"),
      col("p").as("pb"), col("tok"))
    val cands = a.join(b, Seq("tok"))
      .where(col("id1") < col("id2") &&
        col("n1") * num <= col("n2") * den &&
        col("n2") * num <= col("n1") * den &&
        (least(col("n1") - col("pa"), col("n2") - col("pb")) + 1) * (num + den)
          >= (col("n1") + col("n2")) * num)
      .select(col("id1"), col("n1"), col("id2"), col("n2"))
      .distinct()
    // verify candidates with the exact intersection size
    val t1 = toks.select(col("id").as("id1"), col("tok"))
    val t2 = toks.select(col("id").as("id2"), col("tok"))
    cands.join(t1, "id1").join(t2, Seq("id2", "tok"))
      .groupBy("id1", "id2", "n1", "n2")
      .agg(count(lit(1)).as("inter"))
      .where(col("inter") * den >= (col("n1") + col("n2") - col("inter")) * num)
      .select(col("id1"), col("id2"), col("inter"), col("n1"), col("n2"))
  }
}
