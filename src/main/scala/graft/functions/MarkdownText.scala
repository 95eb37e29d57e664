package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Markdown → training text (`markdown_to_text`): the third big text
  * carrier in a code-adjacent crawl (READMEs, docs sites, wiki dumps)
  * after HTML and PDF. One linear pass over a deterministic
  * CommonMark-core subset — the transforms a corpus cleaner actually
  * wants, each stated so the synthesize-and-replay oracle can build
  * text whose cleaned form is a formula:
  *
  * - Fenced code blocks (``` or ~~~ delimited) DROP entirely —
  *   delimiters and content (the C4 posture: code is not prose; the
  *   code-model pipeline takes the raw file, not the markdown view).
  * - ATX headings `#{1,6} text` keep the text; setext underlines
  *   (`===`/`---`-only lines) drop.
  * - Blockquote `>` markers and list markers (`-`/`*`/`+`/`N.` +
  *   space) strip, repeatedly for nesting.
  * - Images `![alt](url)` keep alt; links `[text](url)` keep text
  *   (applied innermost-first so an image inside a link resolves).
  * - Inline code backticks strip (content stays — inline identifiers
  *   ARE prose); emphasis runs of `*` strip; `_` is preserved
  *   (snake_case identifiers outnumber underscore-italics in the
  *   wild by orders of magnitude).
  * - Horizontal rules (`***`/`---`/`___`-only lines) drop; trailing
  *   two-space hard breaks trim with ordinary end-trim.
  * - Non-empty lines join with one `\n`; ends trim — the
  *   [[HtmlToText]] whitespace contract.
  *
  * Map-only, total, never throws. */
case class MarkdownToText(child: Expression) extends UnaryExpression
    with UnaryKernelCodegen {

  override def dataType: DataType = StringType
  override def prettyName: String = "markdown_to_text"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      MarkdownToText.clean(input.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MarkdownToText {
  def apply(text: Column): Column =
    ColumnBridge.column(MarkdownToText(ColumnBridge.expression(text)))

  private def isRuleLine(t: String, marker: Char): Boolean = {
    var n = 0
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c == marker) n += 1
      else if (c != ' ' && c != '\t') return false
      i += 1
    }
    n >= 3
  }

  /** Resolves `![alt](url)` then `[text](url)` spans in one pass each
    * (no regex — bounded scans, hostile brackets never loop). */
  private def resolveLinks(line: String): String = {
    def pass(s: String, image: Boolean): String = {
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val start = if (image) s.startsWith("![", i) else s.charAt(i) == '['
        if (start) {
          val open = i + (if (image) 2 else 1)
          val close = s.indexOf(']', open)
          val paren = if (close >= 0 && close + 1 < s.length &&
            s.charAt(close + 1) == '(') s.indexOf(')', close + 2) else -1
          if (close >= 0 && paren >= 0) {
            sb.append(s.substring(open, close))
            i = paren + 1
          } else { sb.append(s.charAt(i)); i += 1 }
        } else { sb.append(s.charAt(i)); i += 1 }
      }
      sb.toString
    }
    pass(pass(line, image = true), image = false)
  }

  /** The extraction algorithm (see class doc). */
  def clean(md: String): String = {
    if (md == null) return null
    val out = new StringBuilder
    var inFence = false
    var fenceChar = ' '
    md.split("\n", -1).foreach { raw =>
      val line = if (raw.endsWith("\r")) raw.dropRight(1) else raw
      val trimmed = line.trim
      val fenceOpen = trimmed.startsWith("```") || trimmed.startsWith("~~~")
      if (inFence) {
        if (fenceOpen && trimmed.charAt(0) == fenceChar) inFence = false
        // fenced content drops
      } else if (fenceOpen) {
        inFence = true; fenceChar = trimmed.charAt(0)
      } else if (trimmed.isEmpty || isRuleLine(trimmed, '-') ||
          isRuleLine(trimmed, '*') || isRuleLine(trimmed, '_') ||
          isRuleLine(trimmed, '=')) {
        // blank lines, horizontal rules, setext underlines: drop
      } else {
        var t = trimmed
        // blockquote nesting
        while (t.startsWith(">")) t = t.substring(1).trim
        // ATX heading
        if (t.startsWith("#")) {
          val hashes = t.takeWhile(_ == '#').length
          if (hashes <= 6 && hashes < t.length && t.charAt(hashes) == ' ')
            t = t.substring(hashes + 1).trim
        }
        // list markers (one level is enough after the trim loop)
        if ((t.startsWith("- ") || t.startsWith("* ") || t.startsWith("+ ")))
          t = t.substring(2).trim
        else {
          val digits = t.takeWhile(_.isDigit)
          if (digits.nonEmpty && digits.length <= 9 &&
              t.length > digits.length + 1 &&
              t.charAt(digits.length) == '.' &&
              t.charAt(digits.length + 1) == ' ')
            t = t.substring(digits.length + 2).trim
        }
        t = resolveLinks(t)
        // inline code + emphasis-asterisk strip ( '_' preserved)
        t = t.filter(c => c != '`' && c != '*').trim
        if (t.nonEmpty) {
          if (out.nonEmpty) out.append('\n')
          out.append(t)
        }
      }
    }
    out.toString
  }
}
