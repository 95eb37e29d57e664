package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature linear text classifier (the fasttext-shaped scoring
  * pass a curation pipeline runs per document): distinct token FNV-64
  * hashes ([[graft.functions.ShingleHashes]] with n = 1 — one
  * codegen'd pass, no shuffle) fold into `buckets` feature cells, a
  * per-bucket weight maps each cell to an integer in [-100, 100], and
  * the document score is sigmoid(Σw / (100·n)).
  *
  * Scale posture: map-only per document; the model is `buckets`
  * integers REGARDLESS of vocabulary (the feature-hashing trick,
  * Weinberger et al. 2009) — 4096 buckets ≈ 32 KB broadcast at any
  * corpus size. Σw is an exact integer fold over the hash array
  * (order-free); the only doubles are one division, one exp, one
  * round.
  *
  * The default weight table is the deterministic synthetic formula
  * w(b) = (b·31 + 7) mod 201 − 100 — the q219 synthetic-codebook
  * pattern (the MODEL is fixture, the PLUMBING is real), which lets a
  * second engine replay scores bit-for-bit (q230's oracle). Swap
  * `weightOf` for a broadcast trained table without touching the
  * plan shape. */
object HashedClassifier {

  /** The oracle-pinned synthetic bucket weight: integer in [-100, 100]. */
  def syntheticWeight(bucket: Column): Column =
    (bucket * 31L + 7L) % 201L - 100L

  /** Score every row of `df`: (idCol, n_feat, quality). `weightOf`
    * maps a bucket id [0, buckets) to an integer weight column. */
  def score(df: DataFrame, idCol: String, textCol: String,
            buckets: Int = 4096,
            weightOf: Column => Column = syntheticWeight): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    val hs = graft.functions.SketchExpressions
      .shingleHashes64(col(textCol), 1)
    df.select(col(idCol), hs.as("__hs"))
      // null text → null hash array → 0 features (scored null),
      // matching a LEFT JOIN + COALESCE oracle shape. Explicit isNull
      // branch, NOT coalesce(size(..), 0): under
      // spark.sql.legacy.sizeOfNull=true size(null) is -1 (not null),
      // which coalesce would pass through as n_feat = -1 (ADVICE r9);
      // this form is config-independent.
      .select(col(idCol),
        when(col("__hs").isNull, lit(0L))
          .otherwise(size(col("__hs")).cast("long")).as("n_feat"),
        aggregate(col("__hs"), lit(0L),
          (acc, h) => acc + weightOf(pmod(h, lit(buckets.toLong)))).as("__sw"))
      .select(col(idCol), col("n_feat"),
        when(col("n_feat") > 0,
          round(lit(1.0) / (lit(1.0) +
            exp(-(col("__sw").cast("double") /
              (lit(100.0) * col("n_feat"))))), 4)).as("quality"))
  }
}
