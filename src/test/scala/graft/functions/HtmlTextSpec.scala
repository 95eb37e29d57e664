package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[HtmlToText]] — the web-crawl extraction pass — on the HTML
  * shapes a crawl actually carries: script/style elision, quote-aware
  * tags, entities, block-level line breaks, hostile markup. */
class HtmlTextSpec extends SparkSpec {
  import spark.implicits._
  import HtmlToText.clean

  test("tags drop, block tags break lines, whitespace normalizes") {
    assert(clean("<html><body><p>Hello <b>world</b></p><p>Next</p></body></html>")
      == "Hello world\nNext")
    assert(clean("<ul><li>a</li><li>b</li></ul>") == "a\nb")
    assert(clean("<h1>Title</h1>Some   text\n\n  more") == "Title\nSome text more")
    assert(clean("line<br>break<br/>self<br />spaced") == "line\nbreak\nself\nspaced")
    // inline tags vanish without breaks
    assert(clean("a<span>b</span>c <i>d</i>") == "abc d")
    // table structure breaks rows and cells
    assert(clean("<table><tr><td>1</td><td>2</td></tr></table>") == "1\n2")
  }

  test("script/style content drops entirely; comments and doctype drop") {
    assert(clean("<!DOCTYPE html>before<script>var x = '<p>not text</p>';</script>after")
      == "beforeafter")
    assert(clean("a<style type=\"text/css\">p { color: red }</style>b") == "ab")
    assert(clean("x<!-- a comment <p>still comment</p> -->y") == "xy")
    // case-insensitive close tag; unterminated script eats to EOF
    assert(clean("a<SCRIPT>code</ScRiPt>b") == "ab")
    assert(clean("a<script>never closed") == "a")
    // self-closed script has no content to skip
    assert(clean("a<script src=\"x.js\"/>b") == "ab")
  }

  test("pre keeps raw whitespace: indentation, blank lines, tags drop, entities decode") {
    // the code-block case: indentation and line structure survive
    assert(clean("<p>intro</p><pre>def f(x):\n    return x\n\n  # done</pre><p>out</p>")
      == "intro\ndef f(x):\n    return x\n\n  # done\nout")
    // tags inside pre drop but their text stays; entities decode
    assert(clean("<pre><code>if a &lt; b:\n\treturn</code></pre>")
      == "if a < b:\n\treturn")
    // <br> inside pre is a literal newline; \r\n folds to \n
    assert(clean("<pre>one<br>two\r\nthree</pre>") == "one\ntwo\nthree")
    // soft whitespace OUTSIDE pre still collapses around the block
    assert(clean("a   \n  <pre>  x  </pre>   b") == "a\n  x  \nb")
    // unterminated pre runs verbatim to EOF; case-insensitive close
    assert(clean("<pre>a  b") == "a  b")
    assert(clean("<PRE>a  b</PrE>c") == "a  b\nc")
    // self-closed pre has no content; ends still trimmed
    assert(clean("a<pre/>b") == "a\nb")
    assert(clean("<pre>\n\n  x  \n\n</pre>") == "x")
  }

  test("blocks: segmentation with anchor-text accounting; clean is the join") {
    import graft.functions.HtmlToText.{blocks, Block}
    assert(blocks("""<p>intro</p><div>Read <a href="/x">more here</a> now</div>""") ==
      Seq(Block("intro", 0), Block("Read more here now", 9)))
    // the three block classes of a real page: link-dominated nav,
    // prose body, link-dominated footer — the main-content keep rule
    // (len >= 25, 3*link <= len) keeps exactly the body
    val page = """<ul><li><a href="/">Home</a></li><li><a href="/m">More</a></li></ul>""" +
      "<p>Body text tells a longer story &amp; then continues on.</p>" +
      """<div>Footer <a href="/t">terms</a> <a href="/p">privacy</a></div>"""
    val bs = blocks(page)
    assert(bs == Seq(Block("Home", 4), Block("More", 4),
      Block("Body text tells a longer story & then continues on.", 0),
      Block("Footer terms privacy", 12)))
    assert(bs.filter(b => b.text.length >= 25 && 3 * b.linkChars <= b.text.length)
      .map(_.text) ==
      Seq("Body text tells a longer story & then continues on."))
    // anchor depth carries across block boundaries; nested close floors at 0
    assert(blocks("<a>x<p>y</p>z</a>w</a>") ==
      Seq(Block("x", 1), Block("y", 1), Block("zw", 1)))
    // pre is its own block; anchors inside are content, not links
    assert(blocks("<p>a</p><pre>if (x) <a>go</a>\n  y</pre>") ==
      Seq(Block("a", 0), Block("if (x) go\n  y", 0)))
    // entities inside anchors count decoded
    assert(blocks("<p><a>&amp;&lt;</a>ok</p>") == Seq(Block("&<ok", 2)))
    // clean IS the block join (the definitional identity)
    val html = "<h1>T</h1><p>x <a>l</a></p>  tail  "
    assert(clean(html) == "T\nx l\ntail")
    assert(clean(html) ==
      blocks(html).map(_.text).filter(_.nonEmpty).mkString("\n"))
    assert(blocks(null) == Nil && clean(null) == null)
  }

  test("entities decode; unknown and malformed stay literal") {
    assert(clean("a &amp; b &lt;tag&gt; &quot;q&quot; it&apos;s") ==
      "a & b <tag> \"q\" it's")
    assert(clean("x&nbsp;y") == "x y")
    assert(clean("A&#66;C &#x44;E") == "ABC DE")
    assert(clean("&unknown; &amp &#xFFFFFFFF; &#; &#xD800;") ==
      "&unknown; &amp &#xFFFFFFFF; &#; &#xD800;")
  }

  test("quote-aware tag scan and hostile markup") {
    // '>' inside a quoted attribute does not end the tag
    assert(clean("<a href=\"a>b\">link</a>") == "link")
    assert(clean("<img alt='x > y'>z") == "z")
    // '<' with no '>' ahead is literal
    assert(clean("3 < 5") == "3 < 5")
    assert(clean("tail<") == "tail<")
    // unterminated quoted attribute: no '>' ever closes the tag, so
    // the '<' is literal — hostile markup never eats content
    assert(clean("a<a href=\"unclosed b") == "a<a href=\"unclosed b")
    assert(clean("") == "")
    assert(clean(null) == null)
    // byte-soup sweep never throws
    val rnd = new scala.util.Random(62)
    (1 to 300).foreach { _ =>
      val s = new String(Array.fill(rnd.nextInt(60))(
        "<>&;\"'ab/c!#x-".charAt(rnd.nextInt(14))))
      clean(s)
    }
  }

  test("html_to_text is SQL-registered and matches the kernel") {
    graft.core.GraftExtensions.register(spark)
    val df = Seq("<p>one</p><p>two &amp; three</p>").toDF("h")
    df.createOrReplaceTempView("htmlv")
    val viaSql = spark.sql("SELECT html_to_text(h) AS t FROM htmlv")
      .as[String].head()
    assert(viaSql == "one\ntwo & three")
    val viaCol = df.select(HtmlToText(col("h")).as("t")).as[String].head()
    assert(viaCol == viaSql)
    // null propagates
    assert(spark.sql("SELECT html_to_text(CAST(NULL AS STRING))").head().isNullAt(0))
  }
}
