package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML structured-metadata extraction — the page-level signals a
  * crawl-curation pipeline keys on besides the body text: the
  * `<title>`, `meta[name=description]`, `link[rel=canonical]`,
  * `html[lang]`, every OpenGraph / Twitter-card `<meta>` pair in
  * document order, and the raw `<script type="application/ld+json">`
  * bodies (handed back verbatim so the QUERY parses them with
  * Spark's own JSON machinery — `get_json_object` / `parse_json` —
  * instead of this expression growing a JSON parser).
  *
  * One linear walk, the same tag/attribute discipline as
  * [[HtmlToText]] (comments skipped, `script`/`style` bodies never
  * scanned for tags, quoted/unquoted attributes, entities decoded in
  * text and attribute values, ASCII-case-insensitive names).
  * First-wins for the scalar fields (title/description/canonical/
  * lang — the browser rule); `og` keeps every pair in order, capped
  * at [[HtmlMeta.MaxOg]] entries and `jsonld` at
  * [[HtmlMeta.MaxJsonLd]] blocks so hostile pages bound memory.
  * Total: any byte soup in, a (possibly all-null) struct out, never
  * a throw. Null → null. Map-only native expression, SQL name
  * `html_meta`. */
case class HtmlMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = HtmlMeta.Shape
  override def prettyName: String = "html_meta"

  def rowOf(input: UTF8String): InternalRow =
    HtmlMeta.toRow(HtmlMeta.extract(input.toString))

  override def nullSafeEval(input: Any): Any =
    rowOf(input.asInstanceOf[UTF8String])

  // real codegen (not CodegenFallback): evaluated on every routed
  // v13/v14 capstone row — a fallback breaks whole-stage codegen for
  // the projection it sits in (r16 verdict item 2); subexpression
  // elimination keeps the walk at once per row across field reads
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("htmlMeta", this,
      classOf[HtmlMeta].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.rowOf($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** The first `<meta http-equiv=refresh>` redirect target of a page,
  * or NULL — the soft-redirect mechanism beside HTTP 3xx
  * ([[HtmlMeta.refreshUrl]]; feed into [[graft.ops.Redirects]]
  * alongside 3xx edges for one identity graph). Same walk
  * discipline as [[HtmlMeta]], map-only, real codegen, never a
  * throw. SQL name `meta_refresh_url`. */
case class MetaRefreshUrl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "meta_refresh_url"
  // a URL-less refresh (self-reload) yields NULL from non-null input
  override def nullable: Boolean = true

  def urlOf(input: UTF8String): UTF8String = {
    val u = HtmlMeta.refreshUrl(input.toString)
    if (u == null) null else UTF8String.fromString(u)
  }

  override def nullSafeEval(input: Any): Any =
    urlOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("metaRefresh", this,
      classOf[MetaRefreshUrl].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.urlOf($c);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MetaRefreshUrl {
  def apply(html: Column): Column =
    ColumnBridge.column(MetaRefreshUrl(ColumnBridge.expression(html)))
}

object HtmlMeta {

  /** Bound on collected og/twitter pairs (hostile meta-stuffing). */
  val MaxOg = 64
  /** Bound on collected JSON-LD blocks. */
  val MaxJsonLd = 16
  /** Bound on collected hreflang alternates. */
  val MaxAlternates = 32

  val Shape: DataType = StructType(Seq(
    StructField("title", StringType, nullable = true),
    StructField("description", StringType, nullable = true),
    StructField("canonical", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("og", ArrayType(StructType(Seq(
      StructField("property", StringType, nullable = false),
      StructField("content", StringType, nullable = false))),
      containsNull = false), nullable = false),
    StructField("jsonld", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("alternates", ArrayType(StructType(Seq(
      StructField("hreflang", StringType, nullable = false),
      StructField("href", StringType, nullable = false))),
      containsNull = false), nullable = false)))

  def apply(html: Column): Column =
    ColumnBridge.column(HtmlMeta(ColumnBridge.expression(html)))

  final case class Meta(
      title: Option[String],
      description: Option[String],
      canonical: Option[String],
      lang: Option[String],
      og: Seq[(String, String)],
      jsonld: Seq[String],
      alternates: Seq[(String, String)] = Nil)

  private[functions] def toRow(m: Meta): InternalRow = InternalRow(
    m.title.map(UTF8String.fromString).orNull,
    m.description.map(UTF8String.fromString).orNull,
    m.canonical.map(UTF8String.fromString).orNull,
    m.lang.map(UTF8String.fromString).orNull,
    new GenericArrayData(m.og.map { case (p, c) =>
      InternalRow(UTF8String.fromString(p), UTF8String.fromString(c))
    }.toArray[Any]),
    new GenericArrayData(m.jsonld.map(UTF8String.fromString).toArray[Any]),
    new GenericArrayData(m.alternates.map { case (l, h) =>
      InternalRow(UTF8String.fromString(l), UTF8String.fromString(h))
    }.toArray[Any]))

  private def lowerAscii(s: String): String = {
    var i = 0
    var needs = false
    while (i < s.length && !needs) { needs = s.charAt(i) >= 'A' && s.charAt(i) <= 'Z'; i += 1 }
    if (!needs) s
    else {
      val b = new java.lang.StringBuilder(s.length)
      i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        b.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
        i += 1
      }
      b.toString
    }
  }

  /** Entity-decode + whitespace-normalize an attribute value or
    * title text (runs of whitespace → one space, ends trimmed). */
  private def cleanText(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val (dec, next) = HtmlToText.decodeEntity(s, i)
        if (dec == null) {
          if (pendingSpace && b.length > 0) b.append(' ')
          pendingSpace = false
          b.append('&'); i += 1
        } else {
          var j = 0
          var allWs = true
          while (j < dec.length && allWs) { allWs = dec.charAt(j).isWhitespace; j += 1 }
          if (allWs) pendingSpace = true
          else {
            if (pendingSpace && b.length > 0) b.append(' ')
            pendingSpace = false
            b.append(dec)
          }
          i = next
        }
      } else if (c.isWhitespace) { pendingSpace = true; i += 1 }
      else {
        if (pendingSpace && b.length > 0) b.append(' ')
        pendingSpace = false
        b.append(c); i += 1
      }
    }
    b.toString
  }

  /** Attribute list of one tag (between the tag name and `>`),
    * ASCII-lower-cased names, entity-decoded values. Unquoted,
    * single- and double-quoted values; a bare name maps to "". */
  private[functions] def parseAttrs(s: String, from: Int, to: Int): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    var i = from
    while (i < to) {
      while (i < to && (s.charAt(i).isWhitespace || s.charAt(i) == '/')) i += 1
      if (i < to) {
        val ns = i
        while (i < to && !s.charAt(i).isWhitespace && s.charAt(i) != '=' &&
            s.charAt(i) != '/' && s.charAt(i) != '>') i += 1
        val name = lowerAscii(s.substring(ns, i))
        while (i < to && s.charAt(i).isWhitespace) i += 1
        if (i < to && s.charAt(i) == '=') {
          i += 1
          while (i < to && s.charAt(i).isWhitespace) i += 1
          if (i < to && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
            val q = s.charAt(i)
            val vs = i + 1
            i += 1
            while (i < to && s.charAt(i) != q) i += 1
            if (name.nonEmpty) out += ((name, cleanText(s.substring(vs, math.min(i, to)))))
            if (i < to) i += 1 // closing quote
          } else {
            val vs = i
            while (i < to && !s.charAt(i).isWhitespace && s.charAt(i) != '>') i += 1
            if (name.nonEmpty) out += ((name, cleanText(s.substring(vs, i))))
          }
        } else if (name.nonEmpty) out += ((name, ""))
      }
    }
    out.result()
  }

  /** The extraction walk (see class doc). */
  def extract(html: String): Meta = {
    if (html == null) return Meta(None, None, None, None, Nil, Nil, Nil)
    val n = html.length
    var title: Option[String] = None
    var desc: Option[String] = None
    var canonical: Option[String] = None
    var lang: Option[String] = None
    val og = Seq.newBuilder[(String, String)]
    var ogN = 0
    val jsonld = Seq.newBuilder[String]
    var jsonldN = 0
    val alternates = Seq.newBuilder[(String, String)]
    var altN = 0
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { i = n }
      else if (lt + 3 < n && html.charAt(lt + 1) == '!' &&
          html.charAt(lt + 2) == '-' && html.charAt(lt + 3) == '-') {
        val end = html.indexOf("-->", lt + 4)
        i = if (end < 0) n else end + 3
      } else {
        // tag name
        var j = lt + 1
        if (j < n && html.charAt(j) == '/') j += 1
        val ns = j
        while (j < n && (html.charAt(j).isLetterOrDigit)) j += 1
        val name = lowerAscii(html.substring(ns, j))
        val closing = lt + 1 < n && html.charAt(lt + 1) == '/'
        var gt = html.indexOf('>', j)
        if (gt < 0) gt = n
        def attrs = parseAttrs(html, j, gt)
        def attr(attrsSeq: Seq[(String, String)], key: String): Option[String] =
          attrsSeq.collectFirst { case (k, v) if k == key => v }
        if (!closing) name match {
          case "title" =>
            val close = indexOfIgnoreCase(html, "</title", gt + 1)
            val end = if (close < 0) n else close
            if (title.isEmpty && gt < n)
              title = Some(cleanText(html.substring(math.min(gt + 1, n), end)))
            gt = if (close < 0) n - 1 else html.indexOf('>', close) match {
              case -1 => n - 1
              case g => g
            }
          case "script" =>
            val as = attrs
            val close = indexOfIgnoreCase(html, "</script", gt + 1)
            val end = if (close < 0) n else close
            val typ = attr(as, "type").map(t => lowerAscii(t.trim)).getOrElse("")
            if (typ == "application/ld+json" && jsonldN < MaxJsonLd && gt < n) {
              val body = html.substring(math.min(gt + 1, n), end).trim
              if (body.nonEmpty) { jsonld += body; jsonldN += 1 }
            }
            gt = if (close < 0) n - 1 else html.indexOf('>', close) match {
              case -1 => n - 1
              case g => g
            }
          case "style" =>
            val close = indexOfIgnoreCase(html, "</style", gt + 1)
            gt = if (close < 0) n - 1 else html.indexOf('>', close) match {
              case -1 => n - 1
              case g => g
            }
          case "meta" =>
            val as = attrs
            val nameAttr = attr(as, "name").map(lowerAscii)
            val propAttr = attr(as, "property").map(lowerAscii)
            val content = attr(as, "content")
            val key = propAttr.orElse(nameAttr)
            (key, content) match {
              case (Some(k), Some(c)) =>
                if (k == "description" && desc.isEmpty) desc = Some(c)
                else if ((k.startsWith("og:") || k.startsWith("twitter:")) &&
                    ogN < MaxOg) { og += ((k, c)); ogN += 1 }
              case _ =>
            }
          case "link" =>
            val as = attrs
            val rel = attr(as, "rel").map(lowerAscii).getOrElse("")
            // rel is a space-separated token list
            val tokens = rel.split("\\s+")
            if (canonical.isEmpty && tokens.contains("canonical"))
              attr(as, "href").filter(_.nonEmpty).foreach(h => canonical = Some(h))
            if (tokens.contains("alternate") && altN < MaxAlternates) {
              (attr(as, "hreflang").map(_.trim).filter(_.nonEmpty),
                attr(as, "href").filter(_.nonEmpty)) match {
                case (Some(hl), Some(h)) => alternates += ((hl, h)); altN += 1
                case _ =>
              }
            }
          case "html" =>
            if (lang.isEmpty)
              attr(attrs, "lang").map(_.trim).filter(_.nonEmpty)
                .foreach(l => lang = Some(l))
          case _ =>
        }
        i = gt + 1
      }
    }
    Meta(title, desc, canonical, lang, og.result(), jsonld.result(),
      alternates.result())
  }

  /** The FIRST `<meta http-equiv=refresh>` redirect target, or null —
    * the OTHER redirect mechanism crawlers honor beside HTTP 3xx
    * (soft redirects: parked pages, JS-era interstitials, moved
    * blogs). Content parses per the WHATWG rule, simplified: an
    * optional delay number, a `;`/`,` separator, an optional
    * `url =` prefix (any case, spaces tolerated), optional quotes
    * around the URL; a refresh WITHOUT a URL reloads self and is NOT
    * a redirect (null). The delay value is deliberately ignored —
    * identity resolution cares where the page points, not when.
    * Values arrive entity-decoded via the shared attribute parser. */
  def refreshUrl(html: String): String = {
    if (html == null) return null
    val n = html.length
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) return null
      if (lt + 3 < n && html.charAt(lt + 1) == '!' &&
          html.charAt(lt + 2) == '-' && html.charAt(lt + 3) == '-') {
        val end = html.indexOf("-->", lt + 4)
        i = if (end < 0) n else end + 3
      } else {
        var j = lt + 1
        val ns = j
        while (j < n && html.charAt(j).isLetterOrDigit) j += 1
        val name = lowerAscii(html.substring(ns, j))
        var gt = html.indexOf('>', j)
        if (gt < 0) gt = n
        if (name == "meta") {
          val as = parseAttrs(html, j, gt)
          val he = as.collectFirst { case ("http-equiv", v) => v }
            .map(v => lowerAscii(v.trim))
          if (he.contains("refresh")) {
            val content = as.collectFirst { case ("content", v) => v }
            content.foreach { c =>
              val u = parseRefreshContent(c)
              if (u != null) return u
            }
          }
        } else if (name == "script" || name == "style") {
          val close = indexOfIgnoreCase(html, "</" + name, gt + 1)
          gt = if (close < 0) n - 1 else html.indexOf('>', close) match {
            case -1 => n - 1
            case g => g
          }
        }
        i = gt + 1
      }
    }
    null
  }

  /** `content` → URL (null when the refresh is a self-reload). Also
    * reused for the HTTP `Refresh:` RESPONSE header (same WHATWG
    * content syntax; non-standard but emitted by real servers and
    * honored by browsers — [[graft.sources.Warc.warcRedirects]]). */
  private[graft] def parseRefreshContent(c: String): String = {
    var i = 0
    val n = c.length
    while (i < n && c.charAt(i).isWhitespace) i += 1
    while (i < n && (c.charAt(i).isDigit || c.charAt(i) == '.')) i += 1
    while (i < n && (c.charAt(i).isWhitespace || c.charAt(i) == ';' ||
      c.charAt(i) == ',')) i += 1
    if (i >= n) return null
    // optional "url" "=" prefix, any case, spaces tolerated
    if (i + 3 <= n && lowerAscii(c.substring(i, i + 3)) == "url") {
      var k = i + 3
      while (k < n && c.charAt(k).isWhitespace) k += 1
      if (k < n && c.charAt(k) == '=') {
        i = k + 1
        while (i < n && c.charAt(i).isWhitespace) i += 1
      }
    }
    var end = n
    while (end > i && c.charAt(end - 1).isWhitespace) end -= 1
    if (end > i + 1 && (c.charAt(i) == '"' || c.charAt(i) == '\'') &&
        c.charAt(end - 1) == c.charAt(i)) { i += 1; end -= 1 }
    if (end <= i) null else c.substring(i, end)
  }

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = s.length
    val m = needle.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      var k = 0
      var ok = true
      while (k < m && ok) {
        val a = s.charAt(i + k)
        val b = needle.charAt(k)
        val al = if (a >= 'A' && a <= 'Z') (a + 32).toChar else a
        ok = al == b
        k += 1
      }
      if (ok) return i
      i += 1
    }
    -1
  }
}
