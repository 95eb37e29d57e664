package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-profile function-word hit counts in ONE tokenize+probe pass
  * (`profile_word_hits`): element k of the result is how many
  * whitespace tokens of `lower(text)` appear in profile k's word
  * list (with multiplicity — repeated function words are repeated
  * evidence, the [[graft.llm.LangId]] rule). This is the word-side
  * sibling of [[ScriptBlockCounts]]: the crawl scorer used to run
  * one higher-order `filter` over the token array per worded
  * language (~28 passes); one hash probe per token now feeds every
  * profile's count (a word shared by several profiles increments
  * each — ru/uk/bg share Cyrillic stopwords the same way they share
  * the script range). The word → profile-indexes table is instance
  * state, shipped once per executor inside the serialized
  * expression. Null in → null out; map-only, total, never throws.
  *
  * Real codegen (not CodegenFallback): generated code calls
  * [[hitsOf]] through a reference object — subexpression-elimination
  * eligible, one tokenize pass per row however many scorer columns
  * reference it. */
case class ProfileWordHits(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "profile_word_hits"

  // word -> the profile indexes it counts for
  @transient private lazy val table: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Int]]()
    profiles.zipWithIndex.foreach { case (ws, k) =>
      ws.foreach { w =>
        val key = w.toLowerCase(java.util.Locale.ROOT)
        val b = m.get(key)
        if (b == null) {
          val nb = scala.collection.mutable.ArrayBuffer.empty[Int]
          nb += k; m.put(key, nb)
        } else b += k
      }
    }
    val out = new java.util.HashMap[String, Array[Int]](m.size * 2)
    m.forEach((k, v) => out.put(k, v.toArray))
    out
  }

  // exactly the Java-regex \s class the old `split(lower(text),
  // "\\s+")` tokenizer used — NOT Character.isWhitespace, whose wider
  // Unicode set would tokenize differently on exotic whitespace
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
      c == '\f' || c == '\r'

  def hitsOf(input: UTF8String): GenericArrayData = {
    val s = input.toString
      .toLowerCase(java.util.Locale.ROOT)
    val counts = new Array[Long](profiles.length)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(s.charAt(i))) i += 1
      if (i > start) {
        val hit = table.get(s.substring(start, i))
        if (hit != null) {
          var k = 0
          while (k < hit.length) { counts(hit(k)) += 1; k += 1 }
        }
      }
    }
    new GenericArrayData(counts)
  }

  override def nullSafeEval(input: Any): Any =
    hitsOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("profileWordHits", this,
      classOf[ProfileWordHits].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.hitsOf($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ProfileWordHits {
  def apply(text: Column, profiles: Seq[Seq[String]]): Column =
    ColumnBridge.column(
      ProfileWordHits(ColumnBridge.expression(text), profiles))
}
