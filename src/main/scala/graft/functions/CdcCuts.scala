package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking cut points (the rsync/LBFS idea: cut
  * where a rolling hash of the last `k` symbols hits a residue class,
  * so chunk boundaries survive insertions/deletions that shift byte
  * offsets — the property fixed-size blocking lacks, and the basis of
  * chunk-level dedup for near-identical large documents).
  *
  * Returns the 1-based codepoint END positions `i` (i in [k, len])
  * where the base-263 polynomial hash of codepoints (i-k, i] is
  * ≡ 0 (mod `mod`) — the same hash family as [[RollingWinnow]], so
  * the SQL oracle reuses the identical direct-sum formulation. Cuts
  * are purely positional (no minimum-chunk suppression: suppression
  * makes each cut depend on the previous one, which neither a SQL
  * oracle nor a parallel scan can replay independently).
  *
  * A text shorter than `k` has no windows and no cuts (one chunk).
  * Fused native expression (real codegen via the kernel bridge): the per-character
  * rolling update is the loop interpreted HOFs run ~10× slower.
  */
case class CdcCuts(child: Expression, k: Int, mod: Int)
    extends UnaryExpression with UnaryKernelCodegen {
  require(k >= 1, s"k must be >= 1: $k")
  require(mod >= 2, s"mod must be >= 2 (mod 1 cuts everywhere): $mod")

  private val P = (1L << 31) - 1
  private val B = 263L

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_cuts"

  override def nullSafeEval(input: Any): Any = {
    // codepoints, not UTF-16 units — see RollingWinnow's oracle note
    val cp = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cp.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.emptyIntArray)
    var bk = 1L
    var i = 0
    while (i < k - 1) { bk = bk * B % P; i += 1 }
    val out = new java.util.ArrayList[Int]()
    var h = 0L
    i = 0
    while (i < k) { h = (h * B + cp(i)) % P; i += 1 }
    if (h % mod == 0) out.add(k)
    i = 1
    while (i < n) {
      h = ((h - cp(i - 1) * bk % P + P * P) % P * B + cp(i + k - 1)) % P
      if (h % mod == 0) out.add(i + k) // end position of this window
      i += 1
    }
    val arr = new Array[Int](out.size)
    i = 0
    while (i < arr.length) { arr(i) = out.get(i); i += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
