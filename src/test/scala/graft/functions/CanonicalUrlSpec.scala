package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[CanonicalUrl]] — RFC 3986 syntax-based normalization — on
  * the messy forms a crawl's url column actually carries. */
class CanonicalUrlSpec extends SparkSpec {
  import spark.implicits._
  import CanonicalUrl.canonicalize

  test("case, default ports, fragments") {
    assert(canonicalize("HTTP://Example.COM/path") == "http://example.com/path")
    assert(canonicalize("http://ex.com:80/a") == "http://ex.com/a")
    assert(canonicalize("https://ex.com:443/a") == "https://ex.com/a")
    assert(canonicalize("http://ex.com:8080/a") == "http://ex.com:8080/a")
    assert(canonicalize("https://ex.com:80/a") == "https://ex.com:80/a") // not https default
    assert(canonicalize("http://ex.com/a#frag") == "http://ex.com/a")
    assert(canonicalize("http://ex.com#only-frag") == "http://ex.com/")
    assert(canonicalize("http://EX.com") == "http://ex.com/")
    // path/query case is preserved — only scheme+host fold
    assert(canonicalize("http://ex.com/CaseD?Q=V") == "http://ex.com/CaseD?Q=V")
    // userinfo preserved
    assert(canonicalize("ftp://User@EX.com/f") == "ftp://User@ex.com/f")
  }

  test("dot-segment resolution preserves directory form and double slashes") {
    assert(canonicalize("http://ex.com/a/./b/../c") == "http://ex.com/a/c")
    assert(canonicalize("http://ex.com/a/../../b") == "http://ex.com/b")
    assert(canonicalize("http://ex.com/a/b/..") == "http://ex.com/a/")
    assert(canonicalize("http://ex.com/a/.") == "http://ex.com/a/")
    assert(canonicalize("http://ex.com/..") == "http://ex.com/")
    assert(canonicalize("http://ex.com/a//b") == "http://ex.com/a//b")
    assert(canonicalize("http://ex.com/a/../") == "http://ex.com/")
  }

  test("percent-encoding: unreserved decodes, the rest upper-cases, malformed literal") {
    assert(canonicalize("http://ex.com/%41%42c") == "http://ex.com/ABc")
    assert(canonicalize("http://ex.com/%7Euser") == "http://ex.com/~user")
    assert(canonicalize("http://ex.com/a%2fb") == "http://ex.com/a%2Fb") // '/' stays encoded
    assert(canonicalize("http://ex.com/a%20b?x=%3d") == "http://ex.com/a%20b?x=%3D")
    assert(canonicalize("http://ex.com/100%") == "http://ex.com/100%")
    assert(canonicalize("http://ex.com/a%zzb") == "http://ex.com/a%zzb")
  }

  test("non-URLs and odd shapes pass through unchanged; null propagates") {
    assert(canonicalize("not a url") == "not a url")
    assert(canonicalize("mailto:a@b.c") == "mailto:a@b.c") // no '://'
    assert(canonicalize("://nohost") == "://nohost")
    assert(canonicalize("1http://bad-scheme.com/") == "1http://bad-scheme.com/")
    assert(canonicalize("http://") == "http://")
    assert(canonicalize("") == "")
    assert(canonicalize(null) == null)
    // ipv6 hosts don't lose their port discrimination
    assert(canonicalize("http://[2001:DB8::1]/a") == "http://[2001:db8::1]/a")
  }

  test("canonical_url is SQL-registered; equal keys group after normalization") {
    graft.core.GraftExtensions.register(spark)
    val urls = Seq(
      "HTTP://Ex.COM:80/a/../b#x", "http://ex.com/b",
      "http://ex.com/%62?q=1").toDF("u")
    urls.createOrReplaceTempView("urls")
    val keys = spark.sql("SELECT canonical_url(u) AS k FROM urls")
      .as[String].collect().toSeq
    assert(keys(0) == "http://ex.com/b" && keys(1) == "http://ex.com/b")
    assert(keys(2) == "http://ex.com/b?q=1")
    val viaCol = urls.select(CanonicalUrl(col("u")).as("k")).as[String].collect().toSeq
    assert(viaCol == keys)
  }

  test("IDN hosts fold to the A-label: Unicode and xn-- aliases share one key") {
    val want = "http://xn--bcher-kva.example/p/1"
    assert(canonicalize("http://bücher.example/p/1") == want)
    assert(canonicalize("http://BÜCHER.example:80/p/1") == want)
    assert(canonicalize("http://xn--bcher-kva.example/p/1") == want)
    // already-ASCII hosts (incl. existing xn-- labels) never change
    assert(canonicalize("http://plain.example.com/a") == "http://plain.example.com/a")
    // multi-label: only the Unicode labels encode
    assert(canonicalize("http://www.köln.de/x") == "http://www.xn--kln-sna.de/x")
    // a host IDNA can't encode keeps its lower-case form, no throw
    assert(canonicalize("http://bü\uD800cher.example/") ==
      "http://bü\uD800cher.example/".toLowerCase(java.util.Locale.ROOT))
  }

  test("strip_tracking_params: utm_*/click-id removal, order preserved, conservative") {
    import StripTrackingParams.strip
    // the newsletter/ad/social forms of ONE article collapse
    assert(strip("http://ex.com/a?utm_source=nl&utm_medium=email") ==
      "http://ex.com/a")
    assert(strip("http://ex.com/a?fbclid=AbC123") == "http://ex.com/a")
    assert(strip("http://ex.com/a?gclid=x&utm_campaign=q3&id=7") ==
      "http://ex.com/a?id=7")
    // surviving params keep their relative order and exact bytes
    assert(strip("http://ex.com/s?b=2&utm_x=1&a=1") ==
      "http://ex.com/s?b=2&a=1")
    // name match is case-insensitive, value-blind, `=`-optional
    assert(strip("http://ex.com/a?UTM_SOURCE=X&Fbclid") == "http://ex.com/a")
    // conservative: non-tracking names NEVER strip, even look-alikes
    assert(strip("http://ex.com/a?id=utm_source&utmx=1&page=2") ==
      "http://ex.com/a?id=utm_source&utmx=1&page=2")
    // fragments pass through; a fully-stripped query drops its `?`
    assert(strip("http://ex.com/a?utm_s=1#sec") == "http://ex.com/a#sec")
    assert(strip("http://ex.com/a?mc_cid=9&mc_eid=8#x") ==
      "http://ex.com/a#x")
    // no query / empty query / null: unchanged, never a throw
    assert(strip("http://ex.com/a") == "http://ex.com/a")
    assert(strip("http://ex.com/a?") == "http://ex.com/a?")
    assert(strip(null) == null)
    // composes with canonical_url into the dedup key
    assert(canonicalize(strip(
      "HTTP://Ex.COM:80/a/../b?utm_source=feed&gclid=1")) ==
      "http://ex.com/b")
    // the Column + SQL surfaces agree with the kernel
    val urls = Seq("http://ex.com/a?utm_source=nl&id=3").toDF("u")
    assert(urls.select(StripTrackingParams(col("u")).as("s"))
      .as[String].head() == "http://ex.com/a?id=3")
    graft.core.GraftExtensions.register(spark)
    urls.createOrReplaceTempView("stp_urls")
    assert(spark.sql("SELECT strip_tracking_params(u) FROM stp_urls")
      .as[String].head() == "http://ex.com/a?id=3")
  }
}
