package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Robots Exclusion Protocol (RFC 9309) evaluation — the crawl-tier
  * gate between a URL frontier and a fetch: given a robots.txt body,
  * a crawler product token and a URL path, is fetching allowed?
  * A curation pipeline replaying crawl archives needs the SAME
  * decision to audit what was (or should have been) fetched, and a
  * recrawl planner runs it over millions of (host, path) rows — so
  * it is a native expression (map-only, fuses into the frontier
  * scan), not a driver-side library call.
  *
  * Semantics per RFC 9309:
  * - Groups: runs of `User-agent:` lines followed by `Allow:` /
  *   `Disallow:` rules; keys case-insensitive, `#` comments drop.
  * - Group selection: all groups whose user-agent token equals the
  *   crawler's token (case-insensitive) MERGE; if none match, the
  *   `*` groups apply; if neither exists, everything is allowed.
  * - Rule match: path patterns are prefix matches with `*` (any
  *   sequence) and a final `$` (end anchor). The rule with the
  *   LONGEST pattern wins; on a tie, Allow wins. Empty patterns are
  *   ignored; no matching rule → allowed.
  *
  * Hostile posture as everywhere: any byte soup parses to some rule
  * set, never a throw; null inputs → null out.
  *
  * Reference anchor: the reference ships no robots evaluation; this
  * extends SURVEY §2's crawl tier (semantics per RFC 9309 §2). */
case class RobotsAllowed(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with TernaryKernelCodegen {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "robots_allowed"

  override def nullSafeEval(rules: Any, agent: Any, path: Any): Any =
    Robots.allowed(rules.asInstanceOf[UTF8String].toString,
      agent.asInstanceOf[UTF8String].toString,
      path.asInstanceOf[UTF8String].toString)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object RobotsAllowed {
  def apply(rules: Column, agent: Column, path: Column): Column =
    ColumnBridge.column(RobotsAllowed(ColumnBridge.expression(rules),
      ColumnBridge.expression(agent), ColumnBridge.expression(path)))
}

/** The selected group's `Crawl-delay` in whole seconds (fractional
  * values round UP — the polite direction), or null when no selected
  * group declares one — the fetch-scheduler input next to
  * [[RobotsAllowed]]'s yes/no. Same RFC 9309 group selection. */
case class RobotsCrawlDelay(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with BinaryKernelCodegen {

  override def dataType: DataType = LongType
  override def prettyName: String = "robots_crawl_delay"
  // an undeclared Crawl-delay yields NULL even from non-null inputs;
  // inheriting the children's nullability would declare the column
  // non-nullable and corrupt a parquet write on the first such row
  // (the PublicSuffix lesson, r17)
  override def nullable: Boolean = true

  override def nullSafeEval(rules: Any, agent: Any): Any =
    Robots.crawlDelay(rules.asInstanceOf[UTF8String].toString,
      agent.asInstanceOf[UTF8String].toString).orNull

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object RobotsCrawlDelay {
  def apply(rules: Column, agent: Column): Column =
    ColumnBridge.column(RobotsCrawlDelay(ColumnBridge.expression(rules),
      ColumnBridge.expression(agent)))
}

/** `Sitemap:` URLs in document order (group-independent per RFC
  * 9309) — the crawl-frontier seed a robots fetch yields besides its
  * rules. */
case class RobotsSitemaps(child: Expression)
    extends UnaryExpression with UnaryKernelCodegen {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "robots_sitemaps"

  override def nullSafeEval(rules: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Robots.sitemapUrls(rules.asInstanceOf[UTF8String].toString)
        .map(UTF8String.fromString).toArray[Any])

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object RobotsSitemaps {
  def apply(rules: Column): Column =
    ColumnBridge.column(RobotsSitemaps(ColumnBridge.expression(rules)))
}

object Robots {

  /** One parsed group: lower-cased agent tokens and (pattern,
    * isAllow) rules in file order. */
  final case class Group(agents: Seq[String], rules: Seq[(String, Boolean)],
                         crawlDelay: Option[Long] = None)

  /** Parse a robots.txt body into groups (see [[RobotsAllowed]] doc).
    * Unknown directives (crawl-delay, sitemap, …) are skipped but DO
    * close an agent-collection run, like any non-user-agent line. */
  def parse(txt: String): Seq[Group] = {
    if (txt == null) return Nil
    val out = Seq.newBuilder[Group]
    var agents = List.empty[String]
    var rules = List.empty[(String, Boolean)]
    var delay: Option[Long] = None
    var collectingAgents = false
    def flush(): Unit = {
      if (agents.nonEmpty) out += Group(agents.reverse, rules.reverse, delay)
      agents = Nil; rules = Nil; delay = None
    }
    txt.split("\n", -1).foreach { rawLine =>
      val noComment = {
        val h = rawLine.indexOf('#')
        if (h < 0) rawLine else rawLine.substring(0, h)
      }
      val line = noComment.trim
      if (line.nonEmpty) {
        val c = line.indexOf(':')
        if (c > 0) {
          val key = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(c + 1).trim
          key match {
            case "user-agent" =>
              if (!collectingAgents) { flush(); collectingAgents = true }
              if (value.nonEmpty)
                agents ::= value.toLowerCase(java.util.Locale.ROOT)
            case "allow" =>
              collectingAgents = false
              if (value.nonEmpty) rules ::= (value, true)
            case "disallow" =>
              collectingAgents = false
              // empty Disallow = "allow all" by spec: no rule
              if (value.nonEmpty) rules ::= (value, false)
            case "crawl-delay" =>
              collectingAgents = false
              // integer seconds, or a fractional value rounded UP
              // (the polite direction); junk values are no delay
              if (delay.isEmpty) delay = value.toDoubleOption
                .filter(d => d >= 0 && d <= 1e7)
                .map(d => math.ceil(d).toLong)
            case _ =>
              collectingAgents = false // sitemap, junk
          }
        }
      }
    }
    flush()
    out.result()
  }

  /** `Sitemap:` URLs in document order. Per RFC 9309 the directive
    * is group-independent — collected across the whole file. */
  def sitemapUrls(txt: String): Seq[String] = {
    if (txt == null) return Nil
    val out = Seq.newBuilder[String]
    txt.split("\n", -1).foreach { rawLine =>
      val line = {
        val h = rawLine.indexOf('#')
        (if (h < 0) rawLine else rawLine.substring(0, h)).trim
      }
      val c = line.indexOf(':')
      if (c > 0 &&
          line.substring(0, c).trim.equalsIgnoreCase("sitemap")) {
        val v = line.substring(c + 1).trim
        if (v.nonEmpty) out += v
      }
    }
    out.result()
  }

  /** The selected group's crawl-delay — RFC 9309 group selection
    * (exact agent match wins over `*`; see [[allowed]]), first
    * defined delay among the selected groups in document order. */
  def crawlDelay(rulesTxt: String, agent: String): Option[Long] = {
    val groups = parse(rulesTxt)
    val tok = if (agent == null) "" else agent.toLowerCase(java.util.Locale.ROOT)
    val exact = groups.filter(g => g.agents.exists(a => a != "*" && a == tok))
    val sel = if (exact.nonEmpty) exact else groups.filter(_.agents.contains("*"))
    sel.flatMap(_.crawlDelay).headOption
  }

  /** Does a rule pattern (prefix semantics, `*` wildcard, final-`$`
    * end anchor) match a path? */
  private[functions] def patternMatches(pattern: String, path: String): Boolean = {
    if (pattern.isEmpty) return false
    val endAnchor = pattern.charAt(pattern.length - 1) == '$'
    val pat = if (endAnchor) pattern.substring(0, pattern.length - 1) else pattern
    val parts = pat.split("\\*", -1).toIndexedSeq
    if (!path.startsWith(parts.head)) return false
    var pos = parts.head.length
    val lastIdx = parts.length - 1
    var i = 1
    val midEnd = if (endAnchor) lastIdx else parts.length
    while (i < midEnd) {
      val at = path.indexOf(parts(i), pos)
      if (at < 0) return false
      pos = at + parts(i).length
      i += 1
    }
    if (!endAnchor) true
    else if (parts.length == 1) pos == path.length
    else {
      val last = parts(lastIdx)
      path.length - last.length >= pos && path.endsWith(last)
    }
  }

  /** The RFC 9309 decision (see [[RobotsAllowed]] doc). */
  def allowed(rulesTxt: String, agent: String, path: String): Boolean = {
    val groups = parse(rulesTxt)
    if (groups.isEmpty) return true
    val tok = if (agent == null) "" else agent.toLowerCase(java.util.Locale.ROOT)
    val exact = groups.filter(g => g.agents.exists(a => a != "*" && a == tok))
    val sel = if (exact.nonEmpty) exact else groups.filter(_.agents.contains("*"))
    if (sel.isEmpty) return true
    var bestLen = -1
    var bestAllow = true
    sel.foreach(_.rules.foreach { case (pat, isAllow) =>
      if (patternMatches(pat, path)) {
        if (pat.length > bestLen) { bestLen = pat.length; bestAllow = isAllow }
        else if (pat.length == bestLen && isAllow) bestAllow = true // tie → allow
      }
    })
    if (bestLen < 0) true else bestAllow
  }
}

/** Page-level indexability — the robots.txt gate's in-document
  * sibling (Google/Bing robots-meta spec): a page carrying
  * `<meta name="robots" content="…noindex…">` asks to be excluded,
  * and a curation pipeline that honors robots.txt but ignores
  * noindex still ships pages the publisher opted out. Declarative:
  * two case-insensitive regexes over the raw HTML (attribute order
  * varies in the wild — name-then-content and content-then-name both
  * match), so the gate fuses into the same scan as extraction;
  * no UDF, no shuffle. */
object MetaRobots {
  // (?is): case-insensitive, dot-all — the meta tag may wrap lines
  private val NameFirst =
    "(?is).*<meta[^>]*\\bname\\s*=\\s*[\"']?robots\\b[^>]*" +
      "\\bcontent\\s*=\\s*[\"']?[^\"'>]*\\bnoindex.*"
  private val ContentFirst =
    "(?is).*<meta[^>]*\\bcontent\\s*=\\s*[\"']?[^\"'>]*\\bnoindex[^>]*" +
      "\\bname\\s*=\\s*[\"']?robots\\b.*"

  /** True when the page may be kept (no robots-meta noindex). */
  def indexable(html: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    !(html.rlike(NameFirst) || html.rlike(ContentFirst))

  /** Driver/test-side form of the same rule. */
  def indexable(html: String): Boolean =
    html == null ||
      !(html.matches(NameFirst) || html.matches(ContentFirst))

  /** The COMPOSED page-level verdict — header OR meta ⇒ noindex:
    * true only when neither the `X-Robots-Tag` response header
    * ([[XRobotsTag.noindex]]) nor the robots-meta tag opts the page
    * out. `xRobots` null (header absent) gates on the meta tag
    * alone. */
  def indexablePage(html: org.apache.spark.sql.Column,
                    xRobots: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    indexable(html) && !XRobotsTag.noindex(xRobots)
}

/** HTTP-header-level indexability — `X-Robots-Tag` is the response
  * header equivalent of the robots meta tag (same Google/Bing spec)
  * and the only channel for non-HTML carriers (a PDF can't carry a
  * meta tag). Directive grammar: comma-separated tokens, each
  * optionally prefixed by a user-agent name and colon
  * (`googlebot: noindex`); `noindex` and `none` (= noindex,nofollow)
  * both opt out. Declarative regex over the header value — fuses
  * into the extraction scan, no UDF, no shuffle. */
object XRobotsTag {
  // token-boundary match: 'noindex' or 'none' as a whole directive
  // (after start/comma/colon/space, before end/comma/space) — never
  // inside another token like 'nonessential'. Both alternates of the
  // prefix/suffix are anchored, so rlike (find) and matches (full)
  // agree on every input.
  private val Noindex =
    "(?i)(^|.*[,:\\s])(noindex|none)($|[,\\s].*)"

  /** True when the header value asks the page NOT to be indexed.
    * A null column (header absent) is false — absent never blocks. */
  def noindex(value: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.coalesce(
      value.rlike(Noindex), org.apache.spark.sql.functions.lit(false))

  /** Driver/test-side form of the same rule. */
  def noindex(value: String): Boolean =
    value != null && value.matches(Noindex)
}
