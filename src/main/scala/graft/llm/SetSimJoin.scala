package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Prefix-filtered EXACT set-similarity self-join — the PPJoin/
  * AllPairs prefix principle (Chaudhuri et al.'s SSJoin / Xiao et
  * al.'s PPJoin, both public): two token sets with Jaccard ≥ t must
  * share at least one token among each set's first
  * `n − ceil(t·n) + 1` tokens when every set is ordered by GLOBAL
  * token rarity (ascending document frequency). Joining only on
  * those prefix tokens is therefore COMPLETE — unlike MinHash-LSH
  * ([[Dedup.minHashVerifiedPairs]]) there is no recall loss — while
  * the join fan-out stays tiny because prefixes are, by
  * construction, each document's RAREST tokens. Two further standard
  * PPJoin prunes keep low-cardinality vocabularies (where every
  * token is common and the prefix principle alone does nothing)
  * tractable:
  *  · length filter — |A| and |B| within factor t of each other;
  *  · positional filter — a prefix match at positions (pa, pb)
  *    leaves at most min(n1−pa, n2−pb)+1 possible overlaps, which
  *    must reach alpha = ceil(num·(n1+n2)/(num+den)).
  * Both only discard pairs that provably cannot reach t.
  *
  * The threshold is a rational `num/den` and every keep decision is
  * integer arithmetic (`den·|A∩B| ≥ num·(|A|+|B|−|A∩B|)`): no double
  * compare can disagree between engines ([[graft.ops.Sampling]]'s
  * integer-rule discipline).
  *
  * Scale posture: postings are (id, 64-bit hash) primitive rows for
  * `ngram ≥ 2` (the [[Dedup.minHashVerifiedPairs]] lesson — string
  * grams in shuffles/caches cost more than the joins); the global df
  * table shuffles on token; the candidate join touches only prefix
  * postings; and verification intersects PACKED sorted-hash blobs
  * ([[graft.functions.SketchExpressions.packedIntersectCount]],
  * collision odds ~1e-14/pair) restricted to surviving candidates —
  * never all-pairs. The rarity ordering is (df, token): fully
  * deterministic, so results are reproducible across engines and
  * runs.
  */
object SetSimJoin {

  /** Exact token-set Jaccard pairs at threshold `num/den`.
    *
    * `ngram = 1` compares lower-cased word SETS (strings end to end);
    * `ngram ≥ 2` compares word-shingle sets in the q25/q27 gram
    * family, hashed to 64 bits — far more discriminative, which is
    * what keeps the exact answer tractable on template-heavy corpora
    * whose unigram sets form giant near-identical cliques.
    *
    * @return (id1, id2, inter, n1, n2) for every pair with
    *         den·inter ≥ num·(n1 + n2 − inter), id1 < id2
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   num: Int, den: Int, ngram: Int = 1): DataFrame = {
    require(num >= 1 && den >= 1 && num <= den,
      s"setSimJoin: threshold num/den must be in (0, 1]: $num/$den")
    require(ngram >= 1, s"setSimJoin: ngram must be >= 1: $ngram")
    if (ngram == 1) {
      val toks = df
        .select(col(idCol).as("id"),
          explode(split(lower(col(textCol)), " ")).as("tok"))
        .where(col("tok") =!= "").distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      val cands = candidates(toks, num, den)
      val t1 = toks.select(col("id").as("id1"), col("tok"))
      val t2 = toks.select(col("id").as("id2"), col("tok"))
      cands.join(t1, "id1").join(t2, Seq("id2", "tok"))
        .groupBy("id1", "id2", "n1", "n2")
        .agg(count(lit(1)).as("inter"))
        .where(col("inter") * den >= (col("n1") + col("n2") - col("inter")) * num)
        .select(col("id1"), col("id2"), col("inter"), col("n1"), col("n2"))
    } else {
      import graft.functions.{SketchExpressions => SE}
      // primitive (id, hash) postings cache well; computed once for
      // the df table, the per-doc rarity arrays AND the packed blobs
      val toks = graft.core.Engine.widen(df)
        .select(col(idCol).as("id"),
          explode(SE.shingleHashes64(col(textCol), ngram)).as("tok"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      toks.count()
      val cands = candidates(toks, num, den)
      // shingleHashes64 is sorted distinct per doc, so the re-sorted
      // collect is exactly the blob packedIntersectCount expects
      val blobs = toks.groupBy("id")
        .agg(SE.packLongs(sort_array(collect_list(col("tok")))).as("blob"))
      cands
        .join(blobs.select(col("id").as("id1"), col("blob").as("b1")), "id1")
        .join(blobs.select(col("id").as("id2"), col("blob").as("b2")), "id2")
        .withColumn("inter", SE.packedIntersectCount(col("b1"), col("b2")).cast("long"))
        .where(col("inter") * den >= (col("n1") + col("n2") - col("inter")) * num)
        .select(col("id1"), col("id2"), col("inter"), col("n1"), col("n2"))
    }
  }

  /** Shared candidate generation: rarity-ordered prefixes + the
    * length and positional filters. `toks` must be distinct (id, tok)
    * postings. Returns (id1, n1, id2, n2) with id1 < id2. */
  private def candidates(toks: DataFrame, num: Int, den: Int): DataFrame = {
    val dfc = toks.groupBy("tok").agg(count(lit(1)).as("dfc"))
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
    val a = prefix.select(col("id").as("id1"), col("n").as("n1"),
      col("p").as("pa"), col("tok"))
    val b = prefix.select(col("id").as("id2"), col("n").as("n2"),
      col("p").as("pb"), col("tok"))
    a.join(b, Seq("tok"))
      .where(col("id1") < col("id2") &&
        col("n1") * num <= col("n2") * den &&
        col("n2") * num <= col("n1") * den &&
        (least(col("n1") - col("pa"), col("n2") - col("pb")) + 1) * (num + den)
          >= (col("n1") + col("n2")) * num)
      .select(col("id1"), col("n1"), col("id2"), col("n2"))
      .distinct()
  }
}
