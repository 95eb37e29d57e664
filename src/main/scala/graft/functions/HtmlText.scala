package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML → training text — the extraction pass a web-crawl curation
  * pipeline runs before every text-quality/dedup stage: drop markup,
  * keep content. Native expression (map-only, fuses into the quality
  * scan like [[FoldText]]); the heavy lifting is a single
  * linear pass with no regex backtracking:
  *
  * - `<script>`/`<style>` elements drop WITH their content (to the
  *   matching close tag, case-insensitive; unterminated → to EOF).
  * - Comments `<!-- -->` and declarations/doctype `<!...>` drop.
  * - Tags drop; the scan is QUOTE-AWARE (a `>` inside a quoted
  *   attribute value — `href="a>b"` — does not end the tag, the
  *   crawled-HTML reality naive `indexOf('>')` gets wrong).
  * - Block-level tags (p, div, br, li, ul, ol, h1–h6, tr, table,
  *   td, th, section, article, header, footer, blockquote, pre,
  *   hr, dt, dd, figure, form) — opening OR closing — become line
  *   breaks; inline tags (a, b, i, span, …) become nothing.
  * - `<pre>` elements keep their RAW whitespace (indentation and
  *   line structure — code blocks are high-value training text on a
  *   web crawl; collapsing them destroys the code): the element is
  *   scanned to its matching close tag and its content processed
  *   verbatim — tags inside still drop (`<code>`/highlight spans),
  *   entities still decode, but every whitespace char passes through
  *   literally instead of soft-collapsing.
  * - Character entities decode: the named set a crawl actually
  *   carries (amp, lt, gt, quot, apos, nbsp → plain space) and
  *   numeric `&#NNN;`/`&#xHH;` (code-point bounds checked).
  *   Unknown/malformed entities stay literal.
  * - Whitespace: source whitespace collapses to single spaces,
  *   block breaks to single newlines (spaces around a break drop),
  *   ends trimmed — deterministic, SQL-stateable output.
  * - A `<` that opens no tag (no `>` ahead) is literal text: hostile
  *   markup never eats content.
  *
  * Reference anchor: the reference ships no HTML extraction; this
  * serves SURVEY §2's text-pipeline tier (element semantics per the
  * WHATWG HTML living standard's flow-content list). */
case class HtmlToText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "html_to_text"

  def textOf(input: UTF8String): UTF8String =
    UTF8String.fromString(HtmlToText.clean(input.toString))

  override def nullSafeEval(input: Any): Any =
    textOf(input.asInstanceOf[UTF8String])

  // real codegen (not CodegenFallback): the kernel runs on every
  // routed crawl row — a fallback here breaks whole-stage codegen
  // for the entire capstone projection (r16 verdict item 2)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("htmlToText", this,
      classOf[HtmlToText].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.textOf($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** HTML → block-level segments with link accounting — the input a
  * main-content extractor (jusText / Boilerpipe class) consumes:
  * one array element per non-empty block (same tag/entity/verbatim
  * semantics as [[HtmlToText]] — `html_to_text` IS this scan joined
  * with newlines), each carrying its normalized text and the length
  * of its anchor-contained (`<a>…</a>`) text. Boilerplate blocks
  * (navigation, footers, tag clouds) are link-dominated; body prose
  * is not — so the keep rule downstream is integer arithmetic over
  * these two numbers, declarative and oracle-replayable. Map-only. */
case class HtmlBlocks(child: Expression) extends UnaryExpression {

  override def dataType: DataType = HtmlBlocks.Shape
  override def prettyName: String = "html_blocks"

  def blocksOf(input: UTF8String): GenericArrayData = {
    val bs = HtmlToText.blocks(input.toString)
    new GenericArrayData(
      bs.map(b => org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(b.text), b.linkChars)).toArray[Any])
  }

  override def nullSafeEval(input: Any): Any =
    blocksOf(input.asInstanceOf[UTF8String])

  // real codegen — see [[HtmlToText.doGenCode]]
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("htmlBlocks", this,
      classOf[HtmlBlocks].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.blocksOf($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HtmlBlocks {
  val Shape: DataType = ArrayType(StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("link_chars", IntegerType, nullable = false))),
    containsNull = false)

  def apply(text: Column): Column =
    ColumnBridge.column(HtmlBlocks(ColumnBridge.expression(text)))
}

object HtmlToText {
  def apply(text: Column): Column =
    ColumnBridge.column(HtmlToText(ColumnBridge.expression(text)))

  private val BlockTags = Set("p", "div", "br", "li", "ul", "ol",
    "h1", "h2", "h3", "h4", "h5", "h6", "tr", "table", "td", "th",
    "section", "article", "header", "footer", "blockquote", "pre",
    "hr", "dt", "dd", "figure", "form")

  /** The extraction algorithm (see class doc). Deterministic and
    * total: any byte soup in, clean text out, never a throw. Defined
    * as the block scan joined: non-empty [[blocks]] texts with one
    * newline between, document ends trimmed — ONE scanner serves both
    * the flat-text and the per-block (main-content) surfaces. */
  def clean(html: String): String = {
    if (html == null) return null
    edgeTrim(blocks(html).iterator.map(_.text).filter(_.nonEmpty)
      .mkString("\n"))
  }

  /** One block-level text segment: the normalized text between
    * block-tag boundaries and the length of its normalized
    * ANCHOR-contained text (`<a>…</a>`) — the integer a main-content
    * keep rule (jusText/Boilerpipe class) needs: navigation and
    * boilerplate blocks are link-dominated, body prose is not. */
  final case class Block(text: String, linkChars: Int)

  /** HTML split into block-level segments (see class doc for the tag
    * semantics — same elision/entity/verbatim rules as [[clean]],
    * which is this scan joined). Empty blocks are NOT emitted; anchor
    * depth carries across block boundaries; anchors inside `<pre>`
    * are not link-attributed (code blocks are content by contract). */
  def blocks(html: String): Seq[Block] = {
    if (html == null) return Nil
    val n = html.length
    val out = Seq.newBuilder[Block]
    var rawAll = new java.lang.StringBuilder(64)
    var rawAnchor = new java.lang.StringBuilder(16)
    var anchorDepth = 0
    def emit(c: Char): Unit = {
      rawAll.append(c)
      if (anchorDepth > 0) rawAnchor.append(c)
    }
    def emitStr(s: String): Unit = {
      rawAll.append(s)
      if (anchorDepth > 0) rawAnchor.append(s)
    }
    def flush(): Unit = {
      val text = normalizeWs(rawAll)
      if (text.nonEmpty)
        out += Block(text, normalizeWs(rawAnchor).length)
      rawAll = new java.lang.StringBuilder(64)
      rawAnchor = new java.lang.StringBuilder(16)
    }
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val close = html.indexOf("-->", i + 4)
          i = if (close < 0) n else close + 3
        } else if (i + 1 < n && (html.charAt(i + 1) == '!')) {
          val close = html.indexOf('>', i + 2) // doctype / declaration
          i = if (close < 0) n else close + 1
        } else if (i + 1 >= n || !{ val t = html.charAt(i + 1)
            (t >= 'a' && t <= 'z') || (t >= 'A' && t <= 'Z') ||
              t == '/' || t == '?' }) {
          // '<' followed by anything but a name/closer/PI is TEXT per
          // the HTML spec — "5 < 6 and 9 > 7" must not lose ' 6 and 9 '
          emit(c); i += 1
        } else {
          // quote-aware tag scan
          var j = i + 1
          var q = 0.toChar // active quote char, or 0
          var close = -1
          while (close < 0 && j < n) {
            val t = html.charAt(j)
            if (q != 0) { if (t == q) q = 0.toChar }
            else if (t == '"' || t == '\'') q = t
            else if (t == '>') close = j
            j += 1
          }
          if (close < 0) { emit(c); i += 1 } // literal '<'
          else {
            // tag name: [/]letters-digits up to space / '/' / '>'
            var k = i + 1
            val closing = k < close && html.charAt(k) == '/'
            if (closing) k += 1
            val nameStart = k
            while (k < close && { val t = html.charAt(k)
              (t >= 'a' && t <= 'z') || (t >= 'A' && t <= 'Z') ||
                (t >= '0' && t <= '9') }) k += 1
            val name = html.substring(nameStart, k).toLowerCase(java.util.Locale.ROOT)
            val selfClosed = html.charAt(close - 1) == '/'
            i = close + 1
            if (name == "a" && !selfClosed) {
              if (closing) anchorDepth = math.max(0, anchorDepth - 1)
              else anchorDepth += 1
            } else if (!closing && (name == "script" || name == "style") &&
                !selfClosed) {
              // element content drops: scan for the matching close tag
              val (_, after) = elementEnd(html, i, name)
              i = after
              if (BlockTags.contains(name)) flush()
            } else if (!closing && name == "pre" && !selfClosed) {
              // element content keeps its raw whitespace (verbatim),
              // as its own block; anchors inside are content
              flush()
              val (contentEnd, after) = elementEnd(html, i, name)
              verbatim(html, i, contentEnd, rawAll)
              i = after
              flush()
            } else if (BlockTags.contains(name)) flush()
          }
        }
      } else if (c == '&') {
        val (dec, next) = decodeEntity(html, i)
        if (dec != null) { emitStr(dec); i = next }
        else { emit(c); i += 1 }
      } else {
        // source whitespace (incl. newlines) is a soft space; the
        // verbatim escape char can never enter from input (hostile
        // bytes must not forge hard whitespace)
        emit(if (c == '\t' || c == '\r' || c == '\n' || c == Esc) ' ' else c)
        i += 1
      }
    }
    flush()
    out.result()
  }

  /** The escape marking the NEXT char in `raw` as literal (verbatim
    * pre whitespace) — a C0 control HTML text can't legally carry;
    * input occurrences are mapped to plain space before this layer. */
  private val Esc = '\u0001'

  /** (content end, index after the matching close tag) of an element
    * whose content is scanned as a unit (script/style/pre);
    * unterminated → (n, n). */
  private def elementEnd(html: String, from: Int, name: String): (Int, Int) = {
    val n = html.length
    var p = from
    var found = -1
    while (found < 0 && p < n) {
      p = html.indexOf("</", p)
      if (p < 0) p = n
      else if (p + 2 + name.length <= n &&
          html.regionMatches(true, p + 2, name, 0, name.length) && {
            // the close-tag NAME must end here — '</scriptz>'
            // inside the element must not end a <script>
            val after = p + 2 + name.length
            after >= n || { val t = html.charAt(after)
              t == '>' || t == '/' || Character.isWhitespace(t) }
          }) found = p
      else p += 2
    }
    if (found < 0) (n, n)
    else {
      val gt = html.indexOf('>', found)
      (found, if (gt < 0) n else gt + 1)
    }
  }

  /** `<pre>` content: tags drop (quote-aware — `<code>`, highlight
    * spans; a block tag inside, e.g. `<br>`, is a literal newline),
    * entities decode, and EVERY whitespace char is appended behind
    * [[Esc]] so [[normalizeWs]] passes it through untouched. `\r\n`
    * folds to one literal newline. */
  private def verbatim(html: String, from: Int, to: Int,
                       raw: java.lang.StringBuilder): Unit = {
    def literal(c: Char): Unit = { raw.append(Esc); raw.append(c) }
    var i = from
    while (i < to) {
      val c = html.charAt(i)
      if (c == '<') {
        var j = i + 1
        var q = 0.toChar
        var close = -1
        while (close < 0 && j < to) {
          val t = html.charAt(j)
          if (q != 0) { if (t == q) q = 0.toChar }
          else if (t == '"' || t == '\'') q = t
          else if (t == '>') close = j
          j += 1
        }
        if (close < 0) { raw.append(c); i += 1 }
        else {
          var k = i + 1
          if (k < close && html.charAt(k) == '/') k += 1
          val nameStart = k
          while (k < close && { val t = html.charAt(k)
            (t >= 'a' && t <= 'z') || (t >= 'A' && t <= 'Z') ||
              (t >= '0' && t <= '9') }) k += 1
          val nm = html.substring(nameStart, k).toLowerCase(java.util.Locale.ROOT)
          if (BlockTags.contains(nm)) literal('\n')
          i = close + 1
        }
      } else if (c == '&') {
        val (out, next) = decodeEntity(html, i)
        if (out != null) {
          out.foreach(ch => if (ch == ' ' || ch == '\t' || ch == '\n') literal(ch)
            else raw.append(ch))
          i = next
        } else { raw.append(c); i += 1 }
      } else if (c == '\r') {
        literal('\n')
        i += (if (i + 1 < to && html.charAt(i + 1) == '\n') 2 else 1)
      } else if (c == ' ' || c == '\t' || c == '\n') {
        literal(c); i += 1
      } else {
        raw.append(if (c == Esc) ' ' else c)
        i += 1
      }
    }
  }

  /** Decoded entity text and the index after it, or (null, _) when
    * the `&` is not a well-formed known entity. */
  private[functions] def decodeEntity(s: String, at: Int): (String, Int) = {
    val semi = s.indexOf(';', at + 1)
    if (semi < 0 || semi - at > 10) return (null, 0)
    val body = s.substring(at + 1, semi)
    if (body.startsWith("#")) {
      val num = body.substring(1)
      val cp =
        try {
          if (num.length == 0 || num.length > 7) -1
          else if (num.charAt(0) == 'x' || num.charAt(0) == 'X')
            Integer.parseInt(num.substring(1), 16)
          else Integer.parseInt(num, 10)
        } catch { case _: NumberFormatException => -1 }
      if (cp == 9 || cp == 10 || cp == 13 || cp == 32 || cp == 160)
        (" ", semi + 1) // whitespace code points: one soft space, the
                        // same text &nbsp; produces (consistency pin)
      else if (cp > 0x20 && cp <= 0x10FFFF &&
          !(cp >= 0xD800 && cp <= 0xDFFF))
        (new String(Character.toChars(cp)), semi + 1)
      else (null, 0)
    } else body match {
      case "amp" => ("&", semi + 1)
      case "lt" => ("<", semi + 1)
      case "gt" => (">", semi + 1)
      case "quot" => ("\"", semi + 1)
      case "apos" => ("'", semi + 1)
      case "nbsp" => (" ", semi + 1)
      case _ => (null, 0)
    }
  }

  /** Space runs → one space, runs containing a break → one newline,
    * soft whitespace at the ends dropped. An [[Esc]]-prefixed char is
    * LITERAL (verbatim pre whitespace): it flushes any pending soft
    * break and passes through untouched — soft whitespace around it
    * still collapses, whitespace inside a pre run does not (so a pre
    * block's literal edges survive here; [[edgeTrim]] bounds the
    * DOCUMENT ends). */
  private def normalizeWs(raw: java.lang.StringBuilder): String = {
    val out = new java.lang.StringBuilder(raw.length)
    var pending = 0 // 0 none, 1 space, 2 newline
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == Esc && i + 1 < raw.length) {
        if (out.length > 0 && pending > 0)
          out.append(if (pending == 2) '\n' else ' ')
        pending = 0
        out.append(raw.charAt(i + 1))
        i += 1
      } else if (c == ' ') { if (pending < 1) pending = 1 }
      else if (c == '\n') pending = 2
      else {
        if (out.length > 0 && pending > 0)
          out.append(if (pending == 2) '\n' else ' ')
        pending = 0
        out.append(c)
      }
      i += 1
    }
    out.toString
  }

  /** The "ends trimmed" document contract: strip whitespace (incl. a
    * verbatim block's literal edges) from both ends, other chars
    * untouched. */
  private def edgeTrim(text: String): String = {
    var s = 0
    var e = text.length
    while (s < e && { val t = text.charAt(s)
      t == ' ' || t == '\n' || t == '\t' || t == '\r' }) s += 1
    while (e > s && { val t = text.charAt(e - 1)
      t == ' ' || t == '\n' || t == '\t' || t == '\r' }) e -= 1
    text.substring(s, e)
  }
}
