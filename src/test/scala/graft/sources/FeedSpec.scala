package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Feed]] — the RSS/Atom syndication carrier — on element
  * walks, CDATA unwrapping, the body-tag preference order, the item
  * cap, and the hostile posture. */
class FeedSpec extends AnyFunSuite {
  import Feed._

  test("RSS items: title + description, CDATA-wrapped HTML stripped") {
    val xml = """<?xml version="1.0"?><rss version="2.0"><channel>
      |<title>chan title stays out</title>
      |<item><title>T1</title><description><![CDATA[<p>one &amp; two</p>]]></description></item>
      |<item><title>T2</title><description>plain two</description></item>
      |</channel></rss>""".stripMargin
    val d = feedToText(xml).get
    assert(d.kind == "rss" && d.nItems == 2)
    assert(d.text == "T1\none & two\nT2\nplain two")
  }

  test("RSS: content:encoded is the fallback body when description is absent") {
    val xml = "<rss><channel><item><title>T</title>" +
      "<content:encoded><![CDATA[<b>full</b> body]]></content:encoded>" +
      "</item></channel></rss>"
    assert(feedToText(xml).get.text == "T\nfull body")
  }

  test("Atom entries: content preferred over summary; summary alone works") {
    val xml = """<feed xmlns="http://www.w3.org/2005/Atom">
      |<entry><title>A</title><summary>short</summary>
      |  <content type="html">&lt;i&gt;long&lt;/i&gt; form</content></entry>
      |<entry><title>B</title><summary>only summary</summary></entry>
      |</feed>""".stripMargin
    val d = feedToText(xml).get
    assert(d.kind == "atom" && d.nItems == 2)
    // content wins over summary; its escaped HTML decodes THEN strips
    assert(d.text == "A\nlong form\nB\nonly summary")
  }

  test("Atom type=html detection tolerates unquoted/spaced/cased attribute forms") {
    // ADVICE r17: the literal type="html" match missed unquoted,
    // spaced and upper-cased forms, leaking escaped markup. All four
    // declare escaped-HTML content and must double-decode; the xhtml
    // form carries LITERAL markup (RFC 4287 §3.1.1.3) and must NOT.
    def entry(attr: String) =
      s"""<entry><title>T</title><content $attr>&lt;i&gt;x&lt;/i&gt; y</content></entry>"""
    for (attr <- Seq("""type="html"""", "type='html'", "type=html",
        """type = "html"""", """TYPE="HTML"""")) {
      val d = feedToText(s"<feed>${entry(attr)}</feed>").get
      assert(d.text == "T\nx y", s"attr form [$attr] -> [${d.text}]")
    }
    // xhtml: literal inline markup, ONE strip pass (already clean)
    val x = feedToText("""<feed><entry><title>T</title>""" +
      """<content type="xhtml"><div><i>x</i> y</div></content></entry></feed>""").get
    assert(x.text == "T\nx y", x.text)
  }

  test("non-feeds and hostile bytes refuse or bound, never throw") {
    assert(feedToText(null).isEmpty)
    assert(feedToText("").isEmpty)
    assert(feedToText("<html><body>page</body></html>").isEmpty)
    assert(feedToText("{\"json\": true}").isEmpty)
    // unterminated item: entries before the cut survive, walk stops
    val cut = "<rss><channel><item><title>ok</title><description>d</description></item>" +
      "<item><title>never closed"
    assert(feedToText(cut).get.text == "ok\nd")
    // unterminated CDATA keeps the tail verbatim (never throws)
    assert(unwrapCdata("a<![CDATA[tail") == "atail")
    // empty title/body entries contribute nothing but still count
    val empty = "<rss><channel><item><title></title></item></rss>"
    assert(feedToText(empty).get.text == "")
  }

  test("item cap bounds hostile mega-feeds") {
    val items = (0 until MaxItems + 50)
      .map(i => s"<item><title>t$i</title></item>").mkString
    val d = feedToText(s"<rss><channel>$items</channel></rss>").get
    assert(d.nItems == MaxItems)
    assert(d.text.linesIterator.size == MaxItems)
  }

  test("rdf:RDF root (RSS 1.0) routes as rss") {
    val xml = "<rdf:RDF xmlns=\"http://purl.org/rss/1.0/\">" +
      "<item><title>r1</title><description>one</description></item></rdf:RDF>"
    val d = feedToText(xml).get
    assert(d.kind == "rss" && d.text == "r1\none")
  }
}
