package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[PublicSuffix]] — the publicsuffix.org algorithm over the
  * bundled snapshot — on every rule class (exact multi-label,
  * wildcard, exception, implicit `*`, private hosting rules) plus
  * the hostile-input posture, and the SQL/codegen surface. */
class PublicSuffixSpec extends SparkSpec {
  import spark.implicits._
  import PublicSuffix.{publicSuffix, registeredDomain}

  test("multi-label ICANN rules: sisters share a key, the suffix is never one") {
    assert(registeredDomain("a.example.co.uk") == "example.co.uk")
    assert(registeredDomain("b.example.co.uk") == "example.co.uk")
    assert(registeredDomain("deep.sub.example.co.uk") == "example.co.uk")
    assert(registeredDomain("example.co.uk") == "example.co.uk")
    // a public suffix itself has NO registrable domain
    assert(registeredDomain("co.uk") == null)
    assert(registeredDomain("uk") == null)
    assert(publicSuffix("a.example.co.uk") == "co.uk")
  }

  test("implicit * rule: unknown TLDs still split correctly") {
    assert(registeredDomain("x.unknown-tld.zz") == "unknown-tld.zz")
    assert(registeredDomain("unknown-tld.zz") == "unknown-tld.zz")
    assert(registeredDomain("zz") == null)
    assert(publicSuffix("a.b.example.fr") == "fr") // fr needs no rule
    assert(registeredDomain("a.b.example.fr") == "example.fr")
  }

  test("wildcard and exception rules (the ck pair)") {
    // *.ck: foo.ck is a public suffix, so shop.foo.ck is registrable
    assert(publicSuffix("shop.foo.ck") == "foo.ck")
    assert(registeredDomain("shop.foo.ck") == "shop.foo.ck")
    assert(registeredDomain("foo.ck") == null)
    // !www.ck: the exception carves www.ck back out as registrable
    assert(registeredDomain("www.ck") == "www.ck")
    assert(registeredDomain("shop.www.ck") == "www.ck")
    assert(publicSuffix("www.ck") == "ck")
    // the JP city wildcards with their !city exceptions
    assert(registeredDomain("foo.bar.kawasaki.jp") == "foo.bar.kawasaki.jp")
    assert(registeredDomain("city.kawasaki.jp") == "city.kawasaki.jp")
    assert(registeredDomain("sub.city.kawasaki.jp") == "city.kawasaki.jp")
  }

  test("private hosting rules: each site its own domain") {
    assert(registeredDomain("alice.github.io") == "alice.github.io")
    assert(registeredDomain("bob.github.io") == "bob.github.io")
    assert(registeredDomain("github.io") == null)
    assert(registeredDomain("www.alice.github.io") == "alice.github.io")
  }

  test("hostile/invalid inputs: null, never a throw") {
    assert(registeredDomain(null) == null)
    assert(registeredDomain("") == null)
    assert(registeredDomain("..") == null)
    assert(registeredDomain(".leading.example.com") == null)
    assert(registeredDomain("192.168.0.1") == null) // IPv4 literal
    assert(registeredDomain("[::1]") == null) // IPv6 literal
    assert(registeredDomain("ex.com:8080") == null) // port is not a host
    // FQDN trailing dot and case fold
    assert(registeredDomain("WWW.Example.COM.") == "example.com")
  }

  test("custom rules parameter overrides the snapshot") {
    val rules = PublicSuffix.parse(Seq(
      "// comment", "", "my.suffix", "*.w", "!keep.w"))
    assert(registeredDomain("a.b.my.suffix", rules) == "b.my.suffix")
    assert(registeredDomain("x.anything.w", rules) == "x.anything.w")
    assert(registeredDomain("keep.w", rules) == "keep.w")
    // snapshot rules absent from the custom set fall to implicit *
    assert(registeredDomain("a.example.co.uk", rules) == "co.uk")
  }

  test("SQL surface + codegen parity with the Scala walk") {
    val hosts = Seq("a.example.co.uk", "co.uk", "x.github.io", "www.ck",
      "shop.foo.ck", "n.example2.com.br", "plain.example.com", "zz")
    val df = hosts.toDF("h")
    val viaExpr = df.select(RegisteredDomain(col("h"))).as[String].collect()
    graft.core.GraftExtensions.register(spark)
    val viaSql = df.selectExpr("registered_domain(h)").as[String].collect()
    val want = hosts.map(PublicSuffix.registeredDomain(_))
    assert(viaExpr.toSeq == want)
    assert(viaSql.toSeq == want)
    // the sibling public_suffix function shares the walk
    val viaPs = df.selectExpr("public_suffix(h)").as[String].collect()
    assert(viaPs.toSeq == hosts.map(PublicSuffix.publicSuffix(_)))
    // both expressions are real codegen, not CodegenFallback
    assert(!RegisteredDomain(org.apache.spark.sql.catalyst.expressions.Literal("x"))
      .isInstanceOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback])
    assert(!PublicSuffixOf(org.apache.spark.sql.catalyst.expressions.Literal("x"))
      .isInstanceOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback])
  }

  test("nullable contract: NULL out of non-null input survives a parquet round-trip") {
    // regression pin: both expressions return NULL from NON-NULL
    // input (a public-suffix host / an invalid host), so they must
    // DECLARE nullable regardless of the child — the inherited
    // child.nullable wrote corrupt parquet on the first suffix row
    import org.apache.spark.sql.catalyst.expressions.Literal
    assert(RegisteredDomain(Literal("co.uk")).nullable)
    assert(PublicSuffixOf(Literal("co.uk")).nullable)
    val dir = java.nio.file.Files.createTempDirectory("psl-null").toString
    Seq("a.example.co.uk", "co.uk").toDF("h") // literal-array source: non-null child
      .select(col("h"), RegisteredDomain(col("h")).as("d"),
        PublicSuffixOf(col("h")).as("s"))
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).orderBy("h").collect()
    assert(back.length == 2)
    assert(back(0).getString(1) == "example.co.uk")
    assert(back(1).isNullAt(1) && back(1).getString(2) == "co.uk")
  }

  test("bundled snapshot drift gate: rule-class floors, sentinels, provenance") {
    // r18 verdict item 7 (the brotli extraction-provenance pattern):
    // the PSL changes monthly, so the snapshot is refreshed by
    // tools/refresh_psl.py and THIS spec re-validates whatever is
    // installed — a truncated or mangled refresh can never ship.
    // Floors mirror the script's (well under the current ~9.5k
    // rules, far above any truncation), sentinels sample one rule
    // per class, and the provenance header pins the refresh path.
    val lines = PublicSuffix.loadBundledList()
    assert(lines != null, "bundled public_suffix_list.dat missing")
    assert(lines.head.startsWith("// graft PSL snapshot:"),
      "provenance header missing - refresh via tools/refresh_psl.py")
    assert(lines.exists(_.contains("===BEGIN ICANN DOMAINS===")))
    assert(lines.exists(_.contains("===BEGIN PRIVATE DOMAINS===")))
    val rules = PublicSuffix.parse(lines)
    assert(rules.exact.size >= 9000, s"exact rules: ${rules.exact.size}")
    assert(rules.wildcardStem.size >= 80,
      s"wildcard rules: ${rules.wildcardStem.size}")
    assert(rules.exception.size >= 5,
      s"exception rules: ${rules.exception.size}")
    // one sentinel per class (decade-stable entries)
    assert(Seq("com", "co.uk", "github.io", "blogspot.com")
      .forall(rules.exact.contains))
    assert(rules.wildcardStem.contains("bd"))
    assert(rules.exception.contains("city.kawasaki.jp"))
    // IDN rules register BOTH U-label and A-label forms
    val idn = rules.exact.filter(_.exists(_ >= 0x80))
    assert(idn.size >= 300, s"IDN rules: ${idn.size}")
    assert(idn.forall(u =>
      try rules.exact.contains(java.net.IDN.toASCII(u))
      catch { case _: Exception => true } // unconvertible: U-form only
    ), "A-label sibling missing for an IDN rule")
  }
}
