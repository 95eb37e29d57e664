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
    * @return (id1, id2, inter, n1, n2) for every pair with
    *         den·inter ≥ num·(n1 + n2 − inter), id1 < id2
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   num: Int, den: Int): DataFrame = {
    require(num >= 1 && den >= 1 && num <= den,
      s"setSimJoin: threshold num/den must be in (0, 1]: $num/$den")
    val toks = df
      .select(col(idCol).as("id"),
        explode(split(lower(col(textCol)), " ")).as("tok"))
      .where(col("tok") =!= "").distinct()
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
        explode(slice(col("arr").getField("tok"), lit(1), prefixLen)).as("tok"))
    val cands = prefix.as("a")
      .join(prefix.as("b"), col("a.tok") === col("b.tok") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("a.n").as("n1"),
        col("b.id").as("id2"), col("b.n").as("n2"))
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
