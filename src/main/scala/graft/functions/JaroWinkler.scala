package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a fused native expression — the
  * record-linkage metric next to [[graft.ops.FuzzyJoin]]'s edit
  * distance (reference-era joins shipped the same pair in their
  * contrib matchers). Standard parameters: Winkler prefix boost
  * p = 0.1 over at most 4 leading characters, applied only when the
  * Jaro similarity exceeds 0.7 — the de-facto definition DuckDB's
  * `jaro_winkler_similarity` also implements, which is what lets the
  * declared query carry a real oracle (verified char-for-char on the
  * fixture's name columns).
  *
  * Works on codepoints; for the ASCII fixture data this is
  * byte-identical to the oracle's behavior. The two nested matching
  * loops are the reason this is a native expression, not a HOF
  * composition (the ~10× interpreted-overhead lesson of
  * [[RollingWinnow]]).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with BinaryKernelCodegen {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object JaroWinkler {
  /** Standard Jaro-Winkler: match window max(|a|,|b|)/2 − 1,
    * transpositions = half the out-of-order matches, Winkler boost
    * p·len(common prefix ≤ 4)·(1 − jaro) iff jaro > 0.7. */
  def similarity(a: String, b: String): Double = {
    if (a == b) return 1.0
    val s1 = a.codePoints().toArray
    val s2 = b.codePoints().toArray
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    val tr = t / 2
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - tr) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var pl = 0
    while (pl < 4 && pl < l1 && pl < l2 && s1(pl) == s2(pl)) pl += 1
    jaro + pl * 0.1 * (1.0 - jaro)
  }
}
