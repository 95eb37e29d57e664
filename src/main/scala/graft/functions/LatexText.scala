package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** LaTeX → training text (`latex_to_text`): the carrier of the
  * arXiv-class scientific corpora — `.tex` bodies whose prose hides
  * between macros, math, and preamble plumbing. One linear char walk
  * over a deterministic detex-core subset, each transform stated so
  * the synthesize-and-replay oracle can build sources whose cleaned
  * form is a formula (the q290 markdown contract):
  *
  * - `%` comments drop to end of line (`\%` is the escaped literal
  *   percent and stays).
  * - Math drops entirely: `$…$`, `$$…$$`, `\(…\)`, `\[…\]`, and the
  *   bodies of math/verbatim-class environments (equation, align,
  *   eqnarray, displaymath, math, gather, multline, verbatim,
  *   lstlisting, minted, tikzpicture, their starred forms) — prose
  *   models don't train on half-tokenized formulas.
  * - `\begin{X}`/`\end{X}` markers of every other environment drop;
  *   their bodies stay (itemize/quote/abstract/center are prose).
  * - Commands with a REFERENCE-like argument drop the argument too:
  *   label/ref/eqref/pageref/cite (+natbib forms)/url/includegraphics
  *   /input/include/usepackage/documentclass/bibliography(style)/
  *   vspace/hspace/setlength/newcommand/renewcommand/pagestyle/
  *   thispagestyle/graphicspath/hypersetup — their braces carry ids
  *   and paths, not prose. `\href{url}{text}` drops the url group,
  *   keeps the text.
  * - Every OTHER `\command` drops its name and its `[opt]` groups;
  *   brace characters `{`/`}` always drop — so `\section{X}`,
  *   `\emph{X}`, `\textbf{X}` keep X with zero per-command cases.
  * - Escapes unescape: `\%` `\&` `\$` `\#` `\_` `\{` `\}` → the
  *   literal; `\\` is a line break; `~` is a space; other
  *   single-char controls (`\,` `\;` `\!`) drop.
  * - Whitespace contract: runs of spaces/tabs collapse to one space,
  *   line ends trim, non-empty lines join with one `\n` (the
  *   [[HtmlToText]] discipline).
  *
  * Map-only, total, bounded scans (unclosed math or environments skip
  * to end — hostile input can only lose text, never loop or throw). */
case class LatexToText(child: Expression) extends UnaryExpression
    with UnaryKernelCodegen {

  override def dataType: DataType = StringType
  override def prettyName: String = "latex_to_text"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      LatexToText.clean(input.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object LatexToText {
  def apply(text: Column): Column =
    ColumnBridge.column(LatexToText(ColumnBridge.expression(text)))

  /** Environments whose BODY drops (math/verbatim class); starred
    * forms normalize by dropping the `*` before lookup. */
  private val dropEnvs: Set[String] = Set(
    "equation", "align", "alignat", "eqnarray", "displaymath", "math",
    "gather", "multline", "verbatim", "lstlisting", "minted",
    "tikzpicture")

  /** Commands whose braced argument(s) drop with the command. */
  private val dropArg: Set[String] = Set(
    "label", "ref", "eqref", "pageref", "autoref", "cite", "citep",
    "citet", "citealp", "citeauthor", "citeyear", "url", "usepackage",
    "documentclass", "includegraphics", "input", "include",
    "bibliography", "bibliographystyle", "vspace", "hspace",
    "setlength", "newcommand", "renewcommand", "providecommand",
    "pagestyle", "thispagestyle", "graphicspath", "hypersetup")

  private def isLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** Skip one balanced `{…}` group starting at `i` (which must point
    * at `{`); returns the index just past the closing brace, or
    * `s.length` when unclosed. Escaped `\{`/`\}` don't count. */
  private def skipBraceGroup(s: String, i: Int): Int = {
    var j = i + 1
    var depth = 1
    while (j < s.length && depth > 0) {
      val c = s.charAt(j)
      if (c == '\\' && j + 1 < s.length) j += 1
      else if (c == '{') depth += 1
      else if (c == '}') depth -= 1
      j += 1
    }
    j
  }

  /** Skip one `[…]` group starting at `i` (pointing at `[`); bounded,
    * non-nesting (option groups don't nest in practice). */
  private def skipBracketGroup(s: String, i: Int): Int = {
    var j = i + 1
    while (j < s.length && s.charAt(j) != ']') {
      if (s.charAt(j) == '\\' && j + 1 < s.length) j += 1
      j += 1
    }
    math.min(j + 1, s.length)
  }

  /** The env name inside `{…}` at `i` (pointing at `{`), lower-cased,
    * `*` stripped; ("", next index). */
  private def envNameAt(s: String, i: Int): (String, Int) = {
    if (i >= s.length || s.charAt(i) != '{') return ("", i)
    val close = s.indexOf('}', i + 1)
    if (close < 0) return ("", s.length)
    val name = s.substring(i + 1, close).trim.stripSuffix("*")
      .toLowerCase(java.util.Locale.ROOT)
    (name, close + 1)
  }

  /** The deterministic cleaner (contract in the class Scaladoc). */
  def clean(src: String): String = {
    if (src == null) return null
    val s = src
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        val n = s.charAt(i + 1)
        if (isLetter(n)) {
          var j = i + 1
          while (j < s.length && isLetter(s.charAt(j))) j += 1
          if (j < s.length && s.charAt(j) == '*') j += 1
          val name = s.substring(i + 1, j).stripSuffix("*")
            .toLowerCase(java.util.Locale.ROOT)
          // optional [..] groups always drop
          while (j < s.length && s.charAt(j) == '[') j = skipBracketGroup(s, j)
          if (name == "begin") {
            val (env, after) = envNameAt(s, j)
            if (dropEnvs.contains(env)) {
              // drop to the matching \end{env} (literal search — math
              // environments don't nest themselves); unclosed → end
              val endTag = "\\end{" + s.substring(
                s.indexOf('{', j) + 1, after - 1) + "}"
              val at = s.indexOf(endTag, after)
              j = if (at < 0) s.length else at + endTag.length
            } else j = after // marker drops, body stays
            sb.append('\n') // block boundary, normalized below
          } else if (name == "end") {
            val (_, after) = envNameAt(s, j)
            j = after
            sb.append('\n')
          } else if (name == "item") {
            sb.append('\n') // list marker → line break
          } else if (dropArg.contains(name)) {
            while (j < s.length && s.charAt(j) == '{') {
              j = skipBraceGroup(s, j)
              while (j < s.length && s.charAt(j) == '[')
                j = skipBracketGroup(s, j)
            }
          } else if (name == "href") {
            // first group is the url (drops); the text group falls
            // through to the main walk, where braces strip
            if (j < s.length && s.charAt(j) == '{') j = skipBraceGroup(s, j)
          }
          // every other command: name and [opt]s dropped, braces
          // handled by the main walk
          i = j
        } else if (n == '[') {
          // display math \[ … \]
          val at = s.indexOf("\\]", i + 2)
          i = if (at < 0) s.length else at + 2
        } else if (n == '(') {
          val at = s.indexOf("\\)", i + 2)
          i = if (at < 0) s.length else at + 2
        } else if (n == '\\') {
          sb.append('\n')
          i += 2
        } else if (n == '%' || n == '&' || n == '$' || n == '#' ||
            n == '_' || n == '{' || n == '}') {
          sb.append(n)
          i += 2
        } else {
          i += 2 // \, \; \! and other one-char controls drop
        }
      } else if (c == '%') {
        while (i < s.length && s.charAt(i) != '\n') i += 1
      } else if (c == '$') {
        if (i + 1 < s.length && s.charAt(i + 1) == '$') {
          val at = s.indexOf("$$", i + 2)
          i = if (at < 0) s.length else at + 2
        } else {
          var j = i + 1
          while (j < s.length && s.charAt(j) != '$') {
            if (s.charAt(j) == '\\' && j + 1 < s.length) j += 1
            j += 1
          }
          i = math.min(j + 1, s.length)
        }
      } else if (c == '~') {
        sb.append(' ')
        i += 1
      } else if (c == '{' || c == '}') {
        i += 1
      } else {
        sb.append(c)
        i += 1
      }
    }
    // whitespace contract: collapse space runs, trim line ends, drop
    // empty lines, join with one \n
    val out = new StringBuilder(sb.length)
    sb.toString.split("\n", -1).foreach { ln =>
      val t = ln.replaceAll("[ \\t\\x0B\\f\\r]+", " ").trim
      if (t.nonEmpty) {
        if (out.nonEmpty) out.append('\n')
        out.append(t)
      }
    }
    out.toString
  }
}
