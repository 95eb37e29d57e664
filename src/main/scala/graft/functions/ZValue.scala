package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Morton (Z-order) interleave — the multi-dimensional clustering
  * key behind z-ordered table layout: rows sorted by the interleaved
  * bits of their (bucketed) dimension values land so that a range
  * predicate on ANY prefix of dimensions touches a contiguous-ish
  * band of files, which is what makes min/max data skipping work on
  * multi-column filters at 100 TB (one sort, locality for every
  * dimension, vs. lexicographic sort's first-column-only skipping).
  *
  * `z_value(array<bigint>, bits)`: takes the LOW `bits` bits of each
  * dimension (callers bucket/rank first; values clamp into range —
  * negatives to 0) and interleaves them dimension-major: output bit
  * (b · nDims + d) = bit b of dimension d. `bits · nDims` must fit
  * 63 bits. Null array → null; a null element reads as 0 (the
  * bottom-left corner, the conservative cluster for missing keys).
  * Map-only, exact integers — oracle-replayable bit arithmetic. */
case class ZValue(child: Expression, bits: Int)
    extends UnaryExpression with UnaryKernelCodegen {

  require(bits >= 1 && bits <= 63, s"z_value: bits out of range: $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "z_value"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"z_value expects array<bigint>, got ${other.catalogString}")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return 0L
    require(bits * n <= 63,
      s"z_value: $n dims x $bits bits exceeds 63 output bits")
    var z = 0L
    var d = 0
    while (d < n) {
      val raw = if (arr.isNullAt(d)) 0L else arr.getLong(d)
      val v = math.min(math.max(0L, raw), (1L << bits) - 1)
      var b = 0
      while (b < bits) {
        z |= ((v >> b) & 1L) << (b * n + d)
        b += 1
      }
      d += 1
    }
    z
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ZValue {
  def apply(dims: Column, bits: Int): Column =
    ColumnBridge.column(ZValue(ColumnBridge.expression(dims), bits))

  /** Reference implementation for the differential spec. */
  private[graft] def ref(dims: Seq[Long], bits: Int): Long = {
    var z = 0L
    dims.zipWithIndex.foreach { case (raw, d) =>
      val v = math.min(math.max(0L, raw), (1L << bits) - 1)
      (0 until bits).foreach { b =>
        z |= ((v >> b) & 1L) << (b * dims.length + d)
      }
    }
    z
  }
}
