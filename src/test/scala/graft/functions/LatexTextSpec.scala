package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Pins [[LatexToText]]: every declared transform, hostile input,
  * and the Column surface. */
class LatexTextSpec extends SparkSpec {
  import spark.implicits._

  private def c(tex: String) = LatexToText.clean(tex)

  test("comments drop; escaped percent stays") {
    assert(c("real text % a comment\nnext line") == "real text\nnext line")
    assert(c("100\\% sure % but this drops") == "100% sure")
    assert(c("% whole-line comment\nkept") == "kept")
  }

  test("math drops: inline, display, bracket forms, math environments") {
    assert(c("Area $\\pi r^2$ equals math.") == "Area equals math.")
    assert(c("Block $$e=mc^2$$ gone.") == "Block gone.")
    assert(c("Also \\[x+y\\] and \\(z\\) drop.") == "Also and drop.")
    assert(c("Before\n\\begin{equation}\ne = mc^2\n\\end{equation}\nAfter") ==
      "Before\nAfter")
    assert(c("\\begin{align*}\na &= b \\\\\nc &= d\n\\end{align*}\nkept") ==
      "kept")
    assert(c("\\begin{verbatim}\nraw code $ { unbalanced\n\\end{verbatim}\nprose") ==
      "prose")
    // unclosed math can only lose text, never loop
    assert(c("text $unclosed to end") == "text")
    assert(c("text \\[unclosed display") == "text")
  }

  test("prose environments keep their body, markers drop; \\item breaks") {
    val tex =
      """\begin{itemize}
        |\item first point
        |\item second point
        |\end{itemize}
        |\begin{quote}
        |quoted prose
        |\end{quote}""".stripMargin
    assert(c(tex) == "first point\nsecond point\nquoted prose")
  }

  test("sectioning and emphasis keep the braced text; reference-class " +
       "commands drop their argument") {
    assert(c("\\section{Introduction}\nProse \\emph{matters} here.") ==
      "Introduction\nProse matters here.")
    assert(c("\\textbf{Bold} and \\textit{italic} and \\texttt{mono}") ==
      "Bold and italic and mono")
    assert(c("See \\cite{smith2020} and \\ref{fig:x} for \\label{sec:y}text") ==
      "See and for text")
    assert(c("\\usepackage[utf8]{inputenc}\n\\documentclass[11pt]{article}\nkept") ==
      "kept")
    assert(c("\\includegraphics[width=\\textwidth]{fig.png} caption text") ==
      "caption text")
    assert(c("\\href{http://example.org/x}{the link text} stays") ==
      "the link text stays")
    assert(c("\\url{http://example.org/secret} gone") == "gone")
  }

  test("escapes unescape; ~ is a space; \\\\ breaks the line; " +
       "one-char controls drop") {
    assert(c("Tom \\& Jerry pay \\$5 for \\#1 item\\_name \\{braced\\}") ==
      "Tom & Jerry pay $5 for #1 item_name {braced}")
    assert(c("Dr.~Who sees~it") == "Dr. Who sees it")
    assert(c("line one\\\\line two") == "line one\nline two")
    assert(c("a\\,b\\;c\\!d") == "abcd")
  }

  test("whitespace contract: space runs collapse, lines trim, " +
       "empties drop") {
    assert(c("a   b\t\tc  \n\n\n  d  ") == "a b c\nd")
    assert(c("") == "")
    assert(c("\\maketitle\n\\tableofcontents") == "")
  }

  test("hostile input never throws: unbalanced braces, deep nesting, " +
       "binary noise") {
    // an unclosed prose-command brace keeps the text (braces strip as
    // characters; only reference-class arguments consume groups)
    assert(c("\\section{unclosed to the end") == "unclosed to the end")
    assert(c("\\cite{unclosed reference eats to end") == "")
    assert(c("{{{{{{deep}}}}}}") == "deep")
    assert(c("}}}stray close{{{") == "stray close")
    val rnd = new scala.util.Random(41)
    (1 to 200).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(400))(
        (rnd.nextInt(94) + 32).toChar).mkString
      c(junk) // must not throw
    }
    val all = "\\begin{equation" * 50 + "$$$" + "\\end{x}" * 50
    c(all)
  }

  test("the Column surface cleans through the expression") {
    val df = Seq(
      (1L, "\\section{Hi}\nBody \\emph{text} \\& more."),
      (2L, null.asInstanceOf[String]))
      .toDF("id", "tex")
      .select(col("id"), LatexToText(col("tex")).as("txt"))
      .orderBy("id")
    val rows = df.as[(Long, Option[String])].collect().toSeq
    assert(rows == Seq((1L, Some("Hi\nBody text & more.")),
      (2L, None)))
  }
}
