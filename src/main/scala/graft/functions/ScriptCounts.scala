package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** All script-block character counts of a string in ONE pass
  * (`script_block_counts`): element k of the result is the number of
  * chars in `[ranges(k)._1, ranges(k)._2]`. This is the
  * [[graft.llm.LangId.predictCrawl]] hot-path upgrade named in
  * SCALE.md: the profile scorer used to diff `length(text)` against
  * one `regexp_replace` per script range (~12 regex passes per row);
  * one char walk now feeds every range's count. Ranges are
  * inclusive, BMP-only by construction (profile blocks are all BMP;
  * surrogate halves can never fall inside one, so UTF-16 unit
  * counting equals codepoint counting for these ranges). Null in →
  * null out; map-only, total, never throws.
  *
  * Real codegen (not CodegenFallback): the generated code calls
  * [[countsOf]] through a reference object — no InternalRow boxing,
  * and the expression is eligible for whole-stage subexpression
  * elimination, so the 31-language scorer that references it dozens
  * of times still runs ONE char walk per row. */
case class ScriptBlockCounts(child: Expression, ranges: Seq[(Int, Int)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "script_block_counts"

  private lazy val los: Array[Int] = ranges.map(_._1).toArray
  private lazy val his: Array[Int] = ranges.map(_._2).toArray

  def countsOf(input: UTF8String): GenericArrayData = {
    val s = input.toString
    val counts = new Array[Long](los.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i).toInt
      var k = 0
      while (k < los.length) {
        if (c >= los(k) && c <= his(k)) counts(k) += 1
        k += 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override def nullSafeEval(input: Any): Any =
    countsOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("scriptBlockCounts", this,
      classOf[ScriptBlockCounts].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.countsOf($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ScriptBlockCounts {
  def apply(text: Column, ranges: Seq[(Int, Int)]): Column =
    ColumnBridge.column(
      ScriptBlockCounts(ColumnBridge.expression(text), ranges))
}
