package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The four counters behind [[TextFunctions.qualityScore]] in ONE
  * pass over the text (`quality_stats`): element 1 the single-space
  * token count (exactly `size(split(c, " "))` — empty segments
  * included, empty string = 1), element 2 the stopword hit count
  * (case-sensitive byte compare, multiplicity kept — exactly
  * `size(filter(split(c, " "), w => w.isin(words)))`), element 3 the
  * non-[a-z0-9 ] codepoint count of `lower(c)` (exactly
  * `length(regexp_replace(lower(c), "[a-z0-9 ]", ""))` — lowering via
  * the same `UTF8String.toLowerCase` the `lower` SQL function calls),
  * element 4 the codepoint count of `c` (exactly `length(c)`).
  *
  * The r19 formula ran three `split`s, an interpreted higher-order
  * `filter` and a `regexp_replace` per row — five text passes with
  * per-row array/regex allocation, on EVERY curation-gate row
  * (optimization r20, guide "eliminate non-codegen expressions in
  * the hot path"). This walks the UTF-8 bytes twice (original +
  * lowered) with zero allocation beyond the 4-long result; the
  * score arithmetic stays in Column space so the produced doubles
  * are bit-identical. Differential-pinned by QualityStatsSpec.
  *
  * Null in → null out (matches `split(null)`/`length(null)` feeding
  * the old formula). Real codegen via [[UnaryKernelCodegen]]:
  * referencing the array four times in one projection is
  * subexpression-eliminated to a single evaluation.
  */
case class QualityStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with UnaryKernelCodegen {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "quality_stats"

  @transient private lazy val swBytes: Array[Array[Byte]] =
    stopwords.map(_.getBytes("UTF-8")).toArray

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val b = s.getBytes
    // pass 1, original bytes: token segments (0x20 never occurs
    // inside a UTF-8 multi-byte sequence), stopword hits, codepoints
    var tok = 1L; var stop = 0L; var chars = 0L
    var i = 0; var start = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == 0x20) {
        val len = i - start
        var k = 0; var hit = false
        while (!hit && k < swBytes.length) {
          val w = swBytes(k)
          if (w.length == len) {
            var j = 0; var eq = true
            while (eq && j < len) { if (w(j) != b(start + j)) eq = false; j += 1 }
            if (eq) hit = true
          }
          k += 1
        }
        if (hit) stop += 1
        if (i < b.length) tok += 1 // a space starts one more segment
        start = i + 1
      }
      if (i < b.length && (b(i) & 0xC0) != 0x80) chars += 1
      i += 1
    }
    // pass 2, lowered bytes: codepoints outside [a-z0-9 ] — count a
    // multi-byte sequence once at its lead byte
    val low = s.toLowerCase.getBytes
    var na = 0L; var m = 0
    while (m < low.length) {
      val c = low(m) & 0xff
      if ((c & 0xC0) != 0x80 &&
          !((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == ' '))
        na += 1
      m += 1
    }
    new GenericArrayData(Array(tok, stop, na, chars))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object QualityStats {
  def apply(text: Column, stopwords: Seq[String]): Column =
    ColumnBridge.column(
      QualityStats(ColumnBridge.expression(text), stopwords))
}
