package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD 2003) — the rolling-hash fingerprint family: hash every
  * `k`-character window with a polynomial rolling hash, slide a
  * window of `w` consecutive hashes, keep each window's minimum.
  * The guarantee: two documents sharing any substring of at least
  * `w + k - 1` characters share at least one fingerprint — substring-
  * level matching at a few fingerprints per document, where MinHash
  * (whole-document Jaccard) and md5 (exact equality) cannot see
  * partial overlap.
  *
  * Returns the SORTED DISTINCT window-minimum hash values as
  * `array<long>`. Hash: base-263 polynomial over Unicode CODEPOINTS
  * mod 2^31-1 (products stay < 2^52, exact in a long — the same
  * stay-in-range reasoning as [[MinHashSignature]]'s modulus note;
  * codepoints, not UTF-16 units, because SQL oracles index text by
  * codepoint).
  * Texts shorter than `k` yield no fingerprints; with fewer than `w`
  * hashes the single clamped window still yields one (every
  * non-trivial document gets at least one fingerprint).
  *
  * Fused native expression (real codegen, plain-JVM loop) — the
  * per-character rolling update is exactly the pattern that
  * interpreted HOFs evaluate ~10× slower (see [[RepetitionStats]]).
  */
case class RollingWinnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression with UnaryKernelCodegen {
  require(k >= 1 && w >= 1, s"k and w must be >= 1: $k, $w")

  private val P = (1L << 31) - 1
  private val B = 263L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_winnow"

  override def nullSafeEval(input: Any): Any = {
    // hash CODEPOINTS, not UTF-16 units: SQL engines index and ord()
    // by codepoint, so surrogate pairs must be one symbol here too or
    // the q70/q71 oracles diverge on any non-BMP character
    val cp = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cp.length - k + 1 // rolling k-gram hash count
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    // B^(k-1) mod P, for the rolling eviction term
    var bk = 1L
    var i = 0
    while (i < k - 1) { bk = bk * B % P; i += 1 }
    val hashes = new Array[Long](n)
    var h = 0L
    i = 0
    while (i < k) { h = (h * B + cp(i)) % P; i += 1 }
    hashes(0) = h
    i = 1
    while (i < n) {
      h = ((h - cp(i - 1) * bk % P + P * P) % P * B + cp(i + k - 1)) % P
      hashes(i) = h
      i += 1
    }
    // winnow: min of each w-window (single clamped window when n < w)
    val mins = new java.util.TreeSet[java.lang.Long]()
    val windows = math.max(1, n - w + 1)
    var t = 0
    while (t < windows) {
      var m = java.lang.Long.MAX_VALUE
      var j = t
      val end = math.min(t + w, n)
      while (j < end) { if (hashes(j) < m) m = hashes(j); j += 1 }
      mins.add(m)
      t += 1
    }
    val out = new Array[Long](mins.size)
    val it = mins.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
