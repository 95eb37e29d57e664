package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Robots]] — RFC 9309 parsing and the allow/deny decision:
  * group selection and merging, longest-pattern precedence, the
  * allow-wins tie rule, `*`/`$` pattern matching, and the hostile
  * posture (any byte soup decides, never a throw). */
class RobotsSpec extends AnyFunSuite {
  import Robots._

  private val txt =
    """# policy
      |User-agent: graftbot
      |Disallow: /blocked/
      |Allow: /blocked/open/
      |Disallow: /*.zip$
      |
      |User-agent: a
      |User-agent: b
      |Crawl-delay: 2
      |
      |User-agent: *
      |Disallow: /
      |Allow: /public/
      |""".stripMargin

  test("parse: groups, multi-agent runs, comments, unknown directives") {
    val gs = parse(txt)
    assert(gs.map(_.agents) == Seq(Seq("graftbot"), Seq("a", "b"), Seq("*")))
    assert(gs.head.rules == Seq(("/blocked/", false), ("/blocked/open/", true),
      ("/*.zip$", false)))
    assert(gs(1).rules.isEmpty) // crawl-delay is skipped but closes the run
    assert(gs(2).rules == Seq(("/", false), ("/public/", true)))
    assert(parse(null) == Nil && parse("") == Nil)
    assert(parse("junk with no colons\nmore junk") == Nil)
  }

  test("decision: group selection, longest match, tie -> allow") {
    // exact group selected; * group NOT consulted for graftbot
    assert(allowed(txt, "graftbot", "/anything"))
    assert(!allowed(txt, "graftbot", "/blocked/x"))
    // longer Allow overrides the shorter Disallow
    assert(allowed(txt, "GraftBot", "/blocked/open/y")) // agent case-folds
    // unknown agent falls to *: / disallows, /public/ allows (longer)
    assert(!allowed(txt, "otherbot", "/x"))
    assert(allowed(txt, "otherbot", "/public/p"))
    // agent with a group but no rules: everything allowed
    assert(allowed(txt, "a", "/blocked/x"))
    // no robots at all / no matching rule -> allowed
    assert(allowed("", "anybot", "/x"))
    assert(allowed(txt, "graftbot", "/"))
    // tie at equal length: allow wins (both patterns are 4 chars)
    val tie = "User-agent: *\nDisallow: /pq/\nAllow: /p*/\n"
    assert(allowed(tie, "x", "/pq/z"))
  }

  test("patterns: * wildcard, $ anchor, prefix semantics") {
    assert(!allowed(txt, "graftbot", "/files/a.zip")) // /*.zip$
    assert(allowed(txt, "graftbot", "/files/a.zipx")) // anchor fails
    val wild = "User-agent: *\nDisallow: /a*b/c$\n"
    assert(!allowed(wild, "x", "/aXXb/c"))
    assert(allowed(wild, "x", "/aXXb/cd")) // anchored: no suffix
    assert(allowed(wild, "x", "/ab/x")) // missing /c tail
    val prefix = "User-agent: *\nDisallow: /priv\n"
    assert(!allowed(prefix, "x", "/private/page")) // prefix semantics
    // merged groups for the same token combine rules
    val merged = "User-agent: x\nDisallow: /a/\n\nUser-agent: x\nDisallow: /b/\n"
    assert(!allowed(merged, "x", "/a/1") && !allowed(merged, "x", "/b/1"))
    assert(allowed(merged, "x", "/c/1"))
  }

  test("hostile bytes never throw; empty Disallow allows all") {
    val rnd = new scala.util.Random(77)
    (1 to 200).foreach { _ =>
      val junk = new String(Array.fill(rnd.nextInt(200))(
        (rnd.nextInt(96) + 32).toChar))
      allowed(junk, "bot", "/p")
    }
    assert(allowed("User-agent: *\nDisallow:\n", "bot", "/anything"))
    // null path/agent handled at the expression layer; direct calls
    // with empty agent fall through to *
    assert(!allowed("User-agent: *\nDisallow: /\n", "", "/x"))
  }

  test("MetaRobots.indexable: both attribute orders, case, and non-matches") {
    import MetaRobots.indexable
    assert(!indexable("""<meta name="robots" content="noindex,follow"><p>x</p>"""))
    assert(!indexable("""<META CONTENT='NOINDEX,NOFOLLOW' NAME='ROBOTS'>"""))
    assert(!indexable("<meta name=robots content=noindex>")) // unquoted
    assert(indexable("""<meta name="robots" content="index,follow">"""))
    // scope is name=robots: agent-specific metas and unrelated tags pass
    assert(indexable("""<meta name="googlebot" content="noindex">"""))
    assert(indexable("""<meta name="description" content="noindex talk">"""))
    assert(indexable("<p>the word noindex in prose</p>"))
    assert(indexable(null))
  }

  test("XRobotsTag.noindex: directive boundaries, agent scope, none, " +
       "benign values") {
    import XRobotsTag.noindex
    assert(noindex("noindex"))
    assert(noindex("NOINDEX"))
    assert(noindex("noindex, nofollow"))
    assert(noindex("nofollow, noindex"))
    assert(noindex("googlebot: noindex"))
    assert(noindex("none"))
    assert(noindex("NONE, nosnippet"))
    assert(noindex("otherbot: none"))
    // token boundaries: never inside another word
    assert(!noindex("noindexfoo"))
    assert(!noindex("nonessential"))
    assert(!noindex("by_none_token"))
    // benign directives never trip
    assert(!noindex("nofollow, noarchive"))
    assert(!noindex("unavailable_after: 25 Jun 2026 15:00:00 PST"))
    assert(!noindex("index, follow"))
    assert(!noindex(null: String))
    assert(!noindex(""))
  }

  test("the composed header-OR-meta verdict: absent header never " +
       "blocks, either channel drops") {
    // the driver-side twin of MetaRobots.indexablePage (whose Column
    // form is oracle-pinned by q296/q304)
    def page(html: String, x: String): Boolean =
      MetaRobots.indexable(html) && !XRobotsTag.noindex(x)
    assert(page("<p>clean</p>", null))
    assert(!page("<meta name=robots content=noindex><p>x</p>", null))
    assert(!page("<p>clean</p>", "noindex"))
    assert(page("<p>clean</p>", "nofollow"))
    assert(!page("<meta name=robots content=noindex>", "noindex"))
  }

  test("crawl-delay: group-scoped, agent selection as allowed(), " +
       "fractional rounds up, junk ignored, first defined wins") {
    val txt =
      """User-agent: graftbot
        |Crawl-delay: 2.5
        |Disallow: /tmp
        |
        |User-agent: *
        |Crawl-delay: 10
        |Allow: /
        |
        |User-agent: slowbot
        |Crawl-delay: junk
        |""".stripMargin
    assert(Robots.crawlDelay(txt, "graftbot").contains(3L)) // ceil(2.5)
    assert(Robots.crawlDelay(txt, "unknown").contains(10L)) // * group
    assert(Robots.crawlDelay(txt, "slowbot").isEmpty)       // junk value
    assert(Robots.crawlDelay("User-agent: *\nDisallow:", "x").isEmpty)
    assert(Robots.crawlDelay(null, "x").isEmpty)
    // allowed() semantics unchanged with the directive present
    assert(!Robots.allowed(txt, "graftbot", "/tmp/x"))
    assert(Robots.allowed(txt, "anyone", "/page"))
  }

  test("sitemap URLs: group-independent, document order, comments " +
       "stripped, the URL's own colon survives") {
    val txt =
      """User-agent: *
        |Disallow: /private
        |Sitemap: https://ex.com/sitemap1.xml
        |# Sitemap: https://ex.com/commented.xml
        |User-agent: bot
        |sitemap: https://ex.com/sitemap2.xml  # trailing comment
        |""".stripMargin
    assert(Robots.sitemapUrls(txt) ==
      Seq("https://ex.com/sitemap1.xml", "https://ex.com/sitemap2.xml"))
    assert(Robots.sitemapUrls(null).isEmpty)
    assert(Robots.sitemapUrls("no directives at all").isEmpty)
  }

  test("exact-group selection for crawl-delay does not fall back to " +
       "* when the exact group exists but lacks the directive") {
    // the q327 fixture's load-bearing arm (the Column surfaces are
    // oracle-pinned end-to-end by q327)
    val t = "User-agent: a\nDisallow: /x\nUser-agent: *\nCrawl-delay: 7\n"
    assert(Robots.crawlDelay(t, "a").isEmpty)
    assert(Robots.crawlDelay(t, "b").contains(7L))
  }

  test("crawl-delay declares nullable (NULL from non-null inputs — r17 lesson)") {
    // the parquet round-trip itself is pinned in NullableContractSpec
    import org.apache.spark.sql.catalyst.expressions.Literal
    assert(RobotsCrawlDelay(Literal("x"), Literal("y")).nullable)
  }
}
