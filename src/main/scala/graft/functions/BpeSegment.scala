package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass BPE segmentation with a baked-in merge table — the
  * production tokenizer [[graft.llm.BpeTrainer.segment]]'s scaladoc
  * promises: `segment` chains one `aggregate` fold PER merge into the
  * plan (depth grows with the merge count — fine for specs, wrong for
  * a 32k-merge production table), while this expression holds the
  * whole table as instance state and runs the identical sequential
  * greedy algorithm in one JVM loop per word, plan depth O(1) at any
  * table size.
  *
  * Exact-parity contract (differential-spec-pinned in BpeTrainerSpec):
  * for each merge in learned order, one left-to-right pass replaces
  * adjacent (a, b) with a+b, greedy non-overlapping — byte-for-byte
  * the semantics of `segment`'s fold, including the "aaa" → [aa, a]
  * overlap rule. A presence set of every symbol ever seen lets
  * merges whose parts never occur in this word skip in O(1), so the
  * per-word cost tracks the merges that can fire, not the table size.
  *
  * Symbols are Unicode code points (what Spark's `split(word, "")`
  * produces — surrogate pairs stay whole), matching the trainer's
  * `chars`. */
case class BpeSegment(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with UnaryKernelCodegen {

  merges.foreach { case (a, b) =>
    require(a.nonEmpty && b.nonEmpty, s"BpeSegment: empty merge side in ($a, $b)")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_segment"

  override def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    // code-point symbols (split("") semantics: surrogate pairs whole)
    var syms = new java.util.ArrayList[String](word.length)
    val present = new java.util.HashSet[String]()
    var ci = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      val s = new String(Character.toChars(cp))
      syms.add(s); present.add(s)
      ci += Character.charCount(cp)
    }
    merges.foreach { case (a, b) =>
      if (present.contains(a) && present.contains(b)) {
        val out = new java.util.ArrayList[String](syms.size)
        var fused = false
        var i = 0
        while (i < syms.size) {
          val s = syms.get(i)
          if (!out.isEmpty && out.get(out.size - 1) == a && s == b) {
            out.set(out.size - 1, a + b); fused = true
          } else out.add(s)
          i += 1
        }
        if (fused) { syms = out; present.add(a + b); () }
      }
    }
    val arr = new Array[Any](syms.size)
    var i = 0
    while (i < syms.size) { arr(i) = UTF8String.fromString(syms.get(i)); i += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BpeSegment {
  /** Column wrapper: segment `word` with the learned merge list. */
  def apply(word: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeSegment(ColumnBridge.expression(word), merges))
}
