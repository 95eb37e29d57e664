package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization (RFC 3986 §6 syntax-based normalization) —
  * step zero of crawl dedup: the same page arrives as
  * `HTTP://Ex.COM:80/a/../b#x` and `http://ex.com/b`, and URL-keyed
  * dedup/quotas only work after both normalize to one key.
  *
  * Rules applied (the RFC's safe, semantics-preserving set):
  * - scheme and host lower-case; fragment dropped
  * - Unicode hosts fold to their IDNA A-label (`xn--`) form — one
  *   direction, via `java.net.IDN` — so `http://bücher.example/`
  *   and `http://xn--bcher-kva.example/` share one dedup key
  * - default ports dropped (http:80, https:443)
  * - dot-segments resolved (`/a/./b/../c` → `/a/c`); empty path → `/`
  * - percent-encoding normalized: unreserved octets (ALPHA / DIGIT /
  *   `-._~`) decode, every other escape's hex upper-cases; a bare or
  *   malformed `%` stays literal
  * - query kept (order preserved — reordering changes semantics on
  *   real sites), same percent normalization
  *
  * Anything that doesn't parse as `scheme://…` returns unchanged —
  * the conservative contract for a crawled url column. Null → null.
  * Map-only native expression, SQL name `canonical_url`. */
case class CanonicalUrl(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "canonical_url"

  def canonOf(input: UTF8String): UTF8String =
    UTF8String.fromString(CanonicalUrl.canonicalize(input.toString))

  override def nullSafeEval(input: Any): Any =
    canonOf(input.asInstanceOf[UTF8String])

  // real codegen (not CodegenFallback): runs on every v13/v14
  // capstone row — a fallback breaks whole-stage codegen for the
  // projection it sits in (r16 verdict item 2)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("canonicalUrl", this,
      classOf[CanonicalUrl].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.canonOf($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object CanonicalUrl {
  def apply(url: Column): Column =
    ColumnBridge.column(CanonicalUrl(ColumnBridge.expression(url)))

  def canonicalize(url: String): String = {
    if (url == null) return null
    val ss = url.indexOf("://")
    if (ss <= 0) return url
    val scheme = url.substring(0, ss)
    if (!scheme.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.') ||
        !scheme.head.isLetter) return url
    val rest = url.substring(ss + 3)
    // authority ends at the first '/', '?' or '#'
    var ae = 0
    while (ae < rest.length && rest.charAt(ae) != '/' && rest.charAt(ae) != '?' &&
        rest.charAt(ae) != '#') ae += 1
    val authority = rest.substring(0, ae)
    if (authority.isEmpty) return url
    val tail = rest.substring(ae)
    // fragment drops
    val hash = tail.indexOf('#')
    val noFrag = if (hash < 0) tail else tail.substring(0, hash)
    val qm = noFrag.indexOf('?')
    val rawPath = if (qm < 0) noFrag else noFrag.substring(0, qm)
    val rawQuery = if (qm < 0) null else noFrag.substring(qm + 1)
    // authority: [userinfo@]host[:port]
    val at = authority.lastIndexOf('@')
    val userinfo = if (at < 0) null else authority.substring(0, at)
    val hostPort = authority.substring(at + 1)
    val colon = hostPort.lastIndexOf(':')
    val (host0, port0) =
      if (colon >= 0 && hostPort.substring(colon + 1).forall(_.isDigit) &&
          !hostPort.endsWith("]")) // don't split inside [ipv6]
        (hostPort.substring(0, colon), hostPort.substring(colon + 1))
      else (hostPort, null)
    if (host0.isEmpty) return url
    val schemeL = scheme.toLowerCase(java.util.Locale.ROOT)
    val host = {
      val low = host0.toLowerCase(java.util.Locale.ROOT)
      // IDN fold, ONE direction (Unicode → A-label): a Unicode host
      // and its xn-- form are the same page identity, so URL-keyed
      // dedup must see one key. Already-ASCII hosts (incl. existing
      // xn-- labels) pass untouched; a host IDNA can't encode keeps
      // its lower-case form (the conservative contract).
      if (low.forall(_ < 0x80)) low
      else try java.net.IDN.toASCII(low, java.net.IDN.ALLOW_UNASSIGNED)
        .toLowerCase(java.util.Locale.ROOT)
      catch { case _: Exception => low }
    }
    val port = {
      // RFC: the port is a NUMBER — ':080' is the default port too,
      // and a kept port drops leading zeros so aliases share one key
      val num = if (port0 == null) null else {
        val t = port0.dropWhile(_ == '0')
        if (t.isEmpty && port0.nonEmpty) "0" else t
      }
      if (num == null || num.isEmpty) null
      else if (schemeL == "http" && num == "80") null
      else if (schemeL == "https" && num == "443") null
      else num
    }
    val path = resolveDots(pctNormalize(rawPath))
    val query = if (rawQuery == null) null else pctNormalize(rawQuery)
    val sb = new java.lang.StringBuilder(url.length)
    sb.append(schemeL).append("://")
    if (userinfo != null) sb.append(userinfo).append('@')
    sb.append(host)
    if (port != null) sb.append(':').append(port)
    sb.append(if (path.isEmpty) "/" else path)
    if (query != null) sb.append('?').append(query)
    sb.toString
  }

  private def isUnreserved(c: Int): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Decode unreserved escapes, upper-case the rest, pass literals. */
  private def pctNormalize(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') {
        val h1 = if (i + 1 < s.length) hexVal(s.charAt(i + 1)) else -1
        val h2 = if (i + 2 < s.length) hexVal(s.charAt(i + 2)) else -1
        if (h1 >= 0 && h2 >= 0) {
          val v = h1 * 16 + h2
          if (isUnreserved(v)) sb.append(v.toChar)
          else sb.append('%')
            .append(Character.toUpperCase(s.charAt(i + 1)))
            .append(Character.toUpperCase(s.charAt(i + 2)))
          i += 3
        } else { sb.append(c); i += 1 } // malformed escape: literal
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments over an absolute path.
    * Empty segments are PRESERVED (`/a//b` keeps its double slash —
    * collapsing it changes semantics on real servers); a final "." or
    * ".." leaves the directory form (trailing slash). */
  private def resolveDots(path: String): String = {
    if (path.isEmpty || path.indexOf('.') < 0) return path
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var dirTail = false
    path.split("/", -1).drop(1).foreach { // drop the absolute-path marker
      case "." => dirTail = true
      case ".." =>
        if (out.nonEmpty) out.remove(out.length - 1)
        dirTail = true
      case s => out += s; dirTail = false // s may be "" (// or trailing /)
    }
    if (dirTail) out += ""
    if (out.isEmpty) "/" else "/" + out.mkString("/")
  }
}
