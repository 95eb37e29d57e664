package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Tracking-parameter removal — the URL-identity step BESIDE
  * [[CanonicalUrl]]'s RFC 3986 normalization: a large fraction of
  * socially- and ad-referred crawl URLs carry query parameters that
  * exist only to attribute the CLICK (`utm_source=…`, `fbclid=…`,
  * `gclid=…`), so the same article fetched from a newsletter, a feed
  * and two ad platforms lands under four distinct query strings and
  * URL-keyed dedup/quotas count it four times. Stripping the
  * well-known tracking set collapses them onto one key.
  *
  * Deliberately NOT folded into [[CanonicalUrl]]: RFC 3986 §6 only
  * licenses semantics-PRESERVING normalization, and dropping a query
  * parameter is a semantic judgment (a site could genuinely route on
  * `utm_source`). The two compose where that judgment is wanted:
  * `canonical_url(strip_tracking_params(url))`.
  *
  * What strips (the DOCUMENTED conservative set — names that are
  * cross-site click/campaign attribution by construction, never
  * content routing):
  * - any `utm_*` parameter (Google Analytics campaign tags)
  * - click identifiers: `fbclid` `gclid` `gclsrc` `dclid` `wbraid`
  *   `gbraid` (Google/DoubleClick), `msclkid` (Microsoft), `twclid`
  *   (Twitter), `ttclid` (TikTok), `li_fat_id` (LinkedIn), `yclid`
  *   (Yandex), `igshid` (Instagram), `epik` (Pinterest)
  * - email/marketing-automation tokens: `mc_cid` `mc_eid`
  *   (Mailchimp), `mkt_tok` (Marketo), `_hsenc` `_hsmi` (HubSpot),
  *   `vero_id` `vero_conv`, `oly_anc_id` `oly_enc_id` (Omeda),
  *   `s_kwcid` `ef_id` (Adobe)
  *
  * Matching is on the parameter NAME (case-insensitive, text before
  * the first `=`); values and the relative order of surviving
  * parameters are untouched (reordering changes semantics on real
  * sites — the CanonicalUrl discipline). A query left empty drops
  * its `?`; fragments pass through; URLs without a query return
  * unchanged; null → null. Map-only native expression, SQL name
  * `strip_tracking_params`.
  *
  * Reference anchor: the reference ships no URL machinery; this
  * extends SURVEY §2's crawl tier. */
case class StripTrackingParams(child: Expression) extends UnaryExpression
    with UnaryKernelCodegen {

  override def dataType: DataType = StringType
  override def prettyName: String = "strip_tracking_params"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      StripTrackingParams.strip(input.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object StripTrackingParams {
  def apply(url: Column): Column =
    ColumnBridge.column(StripTrackingParams(ColumnBridge.expression(url)))

  /** Exact-name tracking parameters (lower-case); `utm_*` matches by
    * prefix. */
  private val Names: Set[String] = Set(
    "fbclid", "gclid", "gclsrc", "dclid", "wbraid", "gbraid",
    "msclkid", "twclid", "ttclid", "li_fat_id", "yclid", "igshid",
    "epik", "mc_cid", "mc_eid", "mkt_tok", "_hsenc", "_hsmi",
    "vero_id", "vero_conv", "oly_anc_id", "oly_enc_id",
    "s_kwcid", "ef_id")

  private def isTracking(param: String): Boolean = {
    val eq = param.indexOf('=')
    val name = (if (eq < 0) param else param.substring(0, eq))
      .toLowerCase(java.util.Locale.ROOT)
    name.startsWith("utm_") || Names.contains(name)
  }

  def strip(url: String): String = {
    if (url == null) return null
    val q = url.indexOf('?')
    if (q < 0) return url
    val frag = url.indexOf('#', q)
    val end = if (frag < 0) url.length else frag
    val query = url.substring(q + 1, end)
    if (query.isEmpty) return url
    val kept = query.split("&", -1).filterNot(isTracking)
    val sb = new java.lang.StringBuilder(url.length)
    sb.append(url, 0, q)
    // all parameters stripped → the `?` goes too (an empty query and
    // no query are one identity); empty params ("a&&b") survive the
    // filter untouched, preserving the original byte shape
    if (!(kept.isEmpty || (kept.length == 1 && kept(0).isEmpty)))
      sb.append('?').append(kept.mkString("&"))
    if (frag >= 0) sb.append(url, frag, url.length)
    sb.toString
  }
}
