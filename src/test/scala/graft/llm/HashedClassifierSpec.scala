package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The hashed-feature classifier's scoring contract beyond the q230
  * oracle: deterministic replay, the null-text path, and — the
  * ADVICE-r9 pin — config-independence of that path under the legacy
  * sizeOfNull semantics (where `size(null)` is -1, not null, which a
  * coalesce-based n_feat would have passed through as -1). */
class HashedClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "the quick brown fox"), // identical text → identical score
    (3L, null.asInstanceOf[String]),
    (4L, ""),
    (5L, "zebra"))
    .toDF("doc_id", "text")

  test("identical text scores identically; scores are in (0,1)") {
    val out = HashedClassifier.score(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out(1L) == out(2L))
    assert(out(1L)._1 == 4) // 4 distinct tokens
    out.values.flatMap(_._2).foreach(q => assert(q > 0.0 && q < 1.0))
  }

  test("null text scores null with n_feat 0 — under BOTH sizeOfNull configs") {
    def nullRows() = HashedClassifier.score(docs, "doc_id", "text")
      .filter(col("doc_id").isin(3L, 4L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.isNullAt(2))).toSet
    // doc 4 (""): the tokenizer emits one empty-token shingle — a
    // scored single-feature doc, NOT the null path (oracle-pinned
    // q230 byte-level behavior); only genuinely-null text short-cuts
    val expected = Set((3L, 0L, true), (4L, 1L, false))
    assert(nullRows() == expected)
    // legacy semantics: size(null) = -1 instead of null; n_feat must
    // still read 0 (explicit isNull branch, not coalesce — ADVICE r9)
    spark.conf.set("spark.sql.legacy.sizeOfNull", "true")
    try assert(nullRows() == expected)
    finally spark.conf.unset("spark.sql.legacy.sizeOfNull")
  }
}
