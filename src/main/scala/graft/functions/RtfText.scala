package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RTF → training text (`rtf_to_text`): the legacy office carrier
  * still common in older document corpora and email attachments. One
  * linear char walk over the RTF 1.x core (the Word spec's reader
  * rules), each transform stated for the synthesize-and-replay
  * oracle:
  *
  * - Control words `\word[-]N` consume one optional space delimiter;
  *   unknown formatting words drop silently (the spec's rule for
  *   readers).
  * - `\par` and `\line` break the line; `\tab` is a tab;
  *   `\emdash`/`\endash`/`\bullet`/`\lquote`/`\rquote`/`\ldblquote`
  *   /`\rdblquote` map to their characters; `\~` is a space.
  * - Escapes: `\\` `\{` `\}` are the literals; `\'hh` is a
  *   windows-1252 byte; `\uN` is a signed 16-bit Unicode scalar
  *   whose following `\ucN`-many fallback chars (default 1) skip.
  * - Destination groups drop entirely: `{\fonttbl…}`, `{\colortbl…}`,
  *   `{\stylesheet…}`, `{\info…}`, `{\pict…}`, `{\field{\*\fldinst…}}`
  *   instruction legs, and every starred `{\*\…}` destination —
  *   binary and metadata never reach the text.
  * - Group braces maintain a state stack (the `\ucN` skip count is
  *   group-scoped per spec).
  * - Whitespace contract: raw newlines in the source are ignored
  *   (RTF says so), lines trim, empty lines drop, non-empty lines
  *   join with one `\n` — the [[MarkdownToText]] discipline.
  *
  * Map-only, total, bounded (hostile input can only lose text, never
  * loop or throw). */
case class RtfToText(child: Expression) extends UnaryExpression
    with UnaryKernelCodegen {

  override def dataType: DataType = StringType
  override def prettyName: String = "rtf_to_text"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      RtfToText.clean(input.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object RtfToText {
  def apply(text: Column): Column =
    ColumnBridge.column(RtfToText(ColumnBridge.expression(text)))

  /** Destinations whose whole group drops. Starred destinations
    * (`{\*\…}`) drop regardless of the word. */
  private val dropDest: Set[String] = Set(
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "headerf", "footerl",
    "footerr", "footerf", "ftnsep", "ftnsepc", "fldinst", "themedata",
    "colorschememapping", "latentstyles", "datastore", "xmlnstbl")

  private val cp1252 = java.nio.charset.Charset.forName("windows-1252")

  private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** The deterministic cleaner (contract in the class Scaladoc). */
  def clean(src: String): String = {
    if (src == null) return null
    val s = src
    val sb = new StringBuilder(s.length)
    // group state: (skipDepth entered at, ucSkip); skip active while
    // depth >= skipFrom
    var depth = 0
    var skipFrom = Int.MaxValue
    val ucStack = scala.collection.mutable.ArrayBuffer[Int](1)
    var pendingUnicodeSkip = 0
    def uc: Int = ucStack.last
    def emitting: Boolean = depth < skipFrom
    // literal text (and \'hh bytes): these are the \uN fallback
    // characters the spec says to skip
    def emit(c: Char): Unit =
      if (emitting) {
        if (pendingUnicodeSkip > 0) pendingUnicodeSkip -= 1
        else sb.append(c)
      }
    // control-word-generated output (\par, \tab, \emdash…): never a
    // \uN fallback, so it must not consume the skip counter
    def emitSym(c: Char): Unit =
      if (emitting) sb.append(c)
    def emitStr(t: String): Unit = t.foreach(emit)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '{') {
        depth += 1
        ucStack += uc
        i += 1
      } else if (c == '}') {
        if (depth > 0) depth -= 1
        if (ucStack.length > 1) ucStack.remove(ucStack.length - 1)
        if (depth < skipFrom) skipFrom = Int.MaxValue
        // a \uN fallback cannot cross its group's closing brace
        pendingUnicodeSkip = 0
        i += 1
      } else if (c == '\\') {
        if (i + 1 >= s.length) { i += 1 }
        else {
          val n = s.charAt(i + 1)
          if (isAlpha(n)) {
            var j = i + 1
            while (j < s.length && isAlpha(s.charAt(j))) j += 1
            val word = s.substring(i + 1, j)
            // optional signed numeric parameter
            var k = j
            var neg = false
            if (k < s.length && s.charAt(k) == '-') { neg = true; k += 1 }
            var num = 0L
            var hasNum = false
            while (k < s.length && s.charAt(k).isDigit && k - j < 12) {
              num = num * 10 + (s.charAt(k) - '0'); hasNum = true; k += 1
            }
            val param = if (neg) -num else num
            // the spec: one space after a control word is a delimiter,
            // not text
            if (k < s.length && s.charAt(k) == ' ') k += 1
            word match {
              case "par" | "line" | "sect" | "page" => emitSym('\n')
              case "tab" | "cell" => emitSym('\t')
              case "emdash" => emitSym('—')
              case "endash" => emitSym('–')
              case "bullet" => emitSym('•')
              case "lquote" => emitSym('‘')
              case "rquote" => emitSym('’')
              case "ldblquote" => emitSym('“')
              case "rdblquote" => emitSym('”')
              case "uc" =>
                if (hasNum && ucStack.nonEmpty)
                  ucStack(ucStack.length - 1) = math.max(0,
                    math.min(param, 8)).toInt
              case "u" =>
                if (hasNum && emitting) {
                  val cp = (if (param < 0) param + 65536 else param).toInt
                  if (cp >= 0x20 && cp <= 0xffff &&
                      !(cp >= 0xd800 && cp <= 0xdfff))
                    sb.append(cp.toChar)
                  pendingUnicodeSkip = uc
                }
              case w if dropDest.contains(w) =>
                // destination group: skip from the group that opened it
                if (depth < skipFrom) skipFrom = depth
              case _ => // unknown formatting word: drop silently
            }
            i = k
          } else if (n == '\'') {
            // \'hh — one windows-1252 byte
            if (i + 3 < s.length) {
              try {
                val b = Integer.parseInt(s.substring(i + 2, i + 4), 16)
                emitStr(new String(Array(b.toByte), cp1252))
              } catch { case _: NumberFormatException => }
              i += 4
            } else i = s.length
          } else if (n == '*') {
            // {\*\dest …}: a starred destination — skip its group
            if (depth < skipFrom) skipFrom = depth
            i += 2
          } else if (n == '\\' || n == '{' || n == '}') {
            emit(n); i += 2
          } else if (n == '~') {
            emitSym(' '); i += 2
          } else if (n == '\n' || n == '\r') {
            emitSym('\n'); i += 2 // \<newline> is \par per spec
          } else {
            i += 2 // other control symbols drop
          }
        }
      } else if (c == '\n' || c == '\r') {
        i += 1 // raw newlines are NOT text in RTF
      } else {
        emit(c)
        i += 1
      }
    }
    // whitespace contract: trim line ends, drop empties, join with \n
    val out = new StringBuilder(sb.length)
    sb.toString.split("\n", -1).foreach { ln =>
      val t = ln.trim
      if (t.nonEmpty) {
        if (out.nonEmpty) out.append('\n')
        out.append(t)
      }
    }
    out.toString
  }
}
