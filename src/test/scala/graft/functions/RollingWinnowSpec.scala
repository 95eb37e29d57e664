package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Pins [[RollingWinnow]]: the rolling hash equals the direct
  * polynomial hash, the winnowing guarantee holds (shared substring
  * of w+k-1 chars → shared fingerprint), and the degenerate cases. */
class RollingWinnowSpec extends SparkSpec {
  import spark.implicits._

  private def fp(texts: String*): Seq[Seq[Long]] =
    texts.toSeq.toDF("t")
      .select(TextFunctions.rollingFingerprints(col("t")).as("f"))
      .as[Seq[Long]].collect().toSeq

  private val P = (1L << 31) - 1
  private val B = 263L

  /** direct (non-rolling) reference hash of one k-gram */
  private def direct(s: String): Long =
    s.foldLeft(0L)((h, c) => (h * B + c) % P)

  test("rolling hash equals the direct polynomial hash") {
    // k=8, w=1 keeps every hash: compare against direct computation
    val text = "abcdefghijklmno"
    val got = Seq(text).toDF("t")
      .select(org.apache.spark.sql.graft.ColumnBridge.column(
        RollingWinnow(org.apache.spark.sql.graft.ColumnBridge.expression(col("t")), 8, 1)))
      .as[Seq[Long]].head
    val want = (0 to text.length - 8).map(i => direct(text.substring(i, i + 8)))
      .distinct.sorted
    assert(got == want)
  }

  test("winnowing guarantee: shared 11+ char substring shares a fingerprint") {
    // w + k - 1 = 11 with defaults (k=8, w=4)
    val shared = "unique-shared-fragment-long-enough"
    val Seq(a, b, c) = fp(
      s"left padding then $shared and a tail",
      s"completely different prologue $shared other suffix",
      "nothing in common with those two at all here")
    assert(a.toSet.intersect(b.toSet).nonEmpty, "guaranteed overlap missing")
    assert(a.toSet.intersect(c.toSet).isEmpty, "unrelated texts should not collide")
  }

  test("degenerate inputs: short text empty, sub-w hash runs still fingerprint") {
    val Seq(tiny, short) = fp("abc", "abcdefghi") // 0 and 2 hashes (< w)
    assert(tiny.isEmpty)
    assert(short.size == 1, "clamped single window must yield the min")
  }

  test("supplementary-plane characters hash as one codepoint, not two units") {
    val emoji = new String(Character.toChars(0x1F600)) // 2 UTF-16 units
    val text = s"abcdefg$emoji" // 8 codepoints -> exactly one k=8 hash
    val got = Seq(text).toDF("t")
      .select(org.apache.spark.sql.graft.ColumnBridge.column(
        RollingWinnow(org.apache.spark.sql.graft.ColumnBridge.expression(col("t")), 8, 1)))
      .as[Seq[Long]].head
    val want = text.codePoints().toArray.foldLeft(0L)((h, c) => (h * B + c) % P)
    assert(got == Seq(want), s"got $got want $want")
  }

  test("identical texts get identical fingerprint sets, any padding") {
    val Seq(a, b) = fp("the same text body", "the same text body")
    assert(a == b && a.nonEmpty)
  }
}
