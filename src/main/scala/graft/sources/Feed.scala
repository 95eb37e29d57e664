package graft.sources

/** RSS 2.0 / Atom feed → training text — the syndication carrier a
  * web crawl hits constantly (news/blog front doors publish their
  * full articles in the feed, often the cleanest form of the text):
  * RSS `<item>` and Atom `<entry>` elements yield per-entry title +
  * body (description / summary / content), each HTML-stripped and
  * entity-decoded through the SAME [[graft.functions.HtmlToText]]
  * kernel the page path uses (feed bodies are routinely HTML, and
  * routinely CDATA-wrapped HTML).
  *
  * Scope (deliberately the lexical walk, not an XML DOM): element
  * boundaries found case-insensitively, CDATA sections unwrapped
  * BEFORE the HTML strip, the first of description/summary/content
  * per entry wins, entries capped at [[MaxItems]]. Hostile bytes in,
  * (possibly empty) text out, never a throw — the carrier-kernel
  * posture of every other door.
  *
  * Reference anchor: the reference ships no feed reader; this
  * extends SURVEY §2's source tier (formats per the RSS 2.0
  * specification and RFC 4287 Atom). */
object Feed {

  /** Bound on parsed entries (hostile mega-feeds). */
  val MaxItems = 256

  final case class FeedDoc(kind: String, nItems: Int, text: String)

  /** The FIRST `<tag …>…</tag>` inside [from, to) — its opening-tag
    * text (attributes included; Atom's `type="html"` lives there)
    * and its body — or null. Tag names matched case-insensitively on
    * a pre-lowered shadow of the document (offsets are shared). */
  private final case class El(openTag: String, body: String)
  private def firstElement(doc: String, low: String, tag: String,
                           from: Int, to: Int): El = {
    var p = from
    while (p < to) {
      val open = low.indexOf("<" + tag, p)
      if (open < 0 || open >= to) return null
      val afterName = open + 1 + tag.length
      // must be a real tag boundary: '>', whitespace or '/'
      if (afterName < doc.length &&
          (doc.charAt(afterName) == '>' || doc.charAt(afterName) == ' ' ||
           doc.charAt(afterName) == '\t' || doc.charAt(afterName) == '\n' ||
           doc.charAt(afterName) == '\r' || doc.charAt(afterName) == '/')) {
        val gt = doc.indexOf('>', afterName)
        if (gt < 0 || gt >= to) return null
        if (doc.charAt(gt - 1) == '/') { p = gt + 1 } // self-closing: skip
        else {
          val close = low.indexOf("</" + tag, gt + 1)
          if (close < 0 || close > to) return null
          return El(low.substring(open, gt + 1), doc.substring(gt + 1, close))
        }
      } else p = afterName
    }
    null
  }

  /** Unwrap every CDATA section (`<![CDATA[ … ]]>`) to its raw
    * content; unterminated CDATA keeps the tail verbatim. */
  private[sources] def unwrapCdata(s: String): String = {
    val at = s.indexOf("<![CDATA[")
    if (at < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var p = 0
    var open = at
    while (open >= 0) {
      sb.append(s, p, open)
      val end = s.indexOf("]]>", open + 9)
      if (end < 0) { sb.append(s.substring(open + 9)); p = s.length; open = -1 }
      else {
        sb.append(s, open + 9, end)
        p = end + 3
        open = s.indexOf("<![CDATA[", p)
      }
    }
    if (p < s.length) sb.append(s.substring(p))
    sb.toString
  }

  /** Tolerant `type=html` attribute scan over a (lowercased) opening
    * tag: optional whitespace around `=`, optional single/double
    * quotes, any terminator (ADVICE r17 — the literal
    * `type="html"` match missed unquoted and spaced forms, leaking
    * escaped markup into training text). The name is anchored on the
    * left (ADVICE r18): attribute names merely ENDING in "type"
    * (`data-type=html`, `xsi:type='html'`) must not trigger the
    * second unescape pass over literal content. `type="xhtml"` is
    * deliberately NOT matched: RFC 4287 §3.1.1.3 xhtml content is
    * LITERAL inline markup, which the single html_to_text pass
    * already strips — only `html` content is entity-ESCAPED markup
    * needing the second pass. */
  private val TypeHtmlAttr =
    """(?<![\w:-])type\s*=\s*["']?\s*html\s*["']?(?=[\s/>"'])""".r

  /** Clean one element body: CDATA-unwrap, then the html_to_text
    * pass. Atom bodies declared `type="html"` carry ESCAPED HTML —
    * the first pass's entity decode yields the markup, a second
    * pass strips it (RFC 4287 §3.1.1.2). */
  private def cleanPiece(el: El): String = {
    if (el == null) return ""
    val once = graft.functions.HtmlToText.clean(unwrapCdata(el.body))
    if (TypeHtmlAttr.findFirstIn(el.openTag).isDefined)
      graft.functions.HtmlToText.clean(once)
    else once
  }

  /** Parse a feed document. None when the text contains neither an
    * `<rss`/`<rdf:RDF` nor an `<feed` root (not a feed). Each
    * entry contributes `title` and its first body element
    * (description | summary | content), title and body joined by a
    * newline, entries joined by newlines; empty pieces drop. */
  def feedToText(xml: String): Option[FeedDoc] = {
    if (xml == null || xml.isEmpty) return None
    val doc = xml
    val low = doc.toLowerCase(java.util.Locale.ROOT)
    val head = low.substring(0, math.min(low.length, 2048))
    val (kind, entryTag, bodyTags) =
      if (head.contains("<rss") || head.contains("<rdf:rdf"))
        ("rss", "item", Seq("description", "content:encoded"))
      else if (head.contains("<feed"))
        ("atom", "entry", Seq("content", "summary"))
      else return None
    val pieces = Seq.newBuilder[String]
    var n = 0
    var p = 0
    while (n < MaxItems && p < doc.length) {
      val open = low.indexOf("<" + entryTag, p)
      if (open < 0) { p = doc.length }
      else {
        val gt = doc.indexOf('>', open)
        val close = low.indexOf("</" + entryTag, math.max(gt, open) + 1)
        if (gt < 0 || close < 0) { p = doc.length } // unterminated: stop
        else {
          val title = cleanPiece(firstElement(doc, low, "title", gt + 1, close))
          var body: El = null
          val it = bodyTags.iterator
          while (body == null && it.hasNext)
            body = firstElement(doc, low, it.next(), gt + 1, close)
          val bodyText = cleanPiece(body)
          val both = Seq(title, bodyText).filter(_.nonEmpty).mkString("\n")
          if (both.nonEmpty) pieces += both
          n += 1
          p = close + 1
        }
      }
    }
    Some(FeedDoc(kind, n, pieces.result().mkString("\n")))
  }
}
