package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenFallback, GenerateUnsafeProjection}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Pins the crawl-capstone expressions as REAL codegen (r16 verdict
  * item 2): each generates compilable Java through
  * GenerateUnsafeProjection — which THROWS on bad generated code,
  * where a full query would silently fall back to interpreted — and
  * the generated path agrees with the interpreted eval byte for
  * byte. No SparkSession needed: this is the expression layer. */
class CodegenSpec extends AnyFunSuite {

  private val html =
    """<html lang="en"><head><title>T &amp; U</title>
      |<link rel="canonical" href="http://ex.com/c">
      |<meta property="og:type" content="article"></head>
      |<body><h1>Head</h1><p>body <a href="/x">link</a> text</p>
      |<script>drop()</script></body></html>""".stripMargin

  private def genEval(e: org.apache.spark.sql.catalyst.expressions.Expression,
                      input: String): InternalRow = {
    val proj = GenerateUnsafeProjection.generate(Seq(e))
    proj(InternalRow(if (input == null) null else UTF8String.fromString(input)))
      .copy()
  }

  private val in = BoundReference(0, StringType, nullable = true)

  test("html_to_text: generated == interpreted, not CodegenFallback") {
    val e = HtmlToText(in)
    assert(!e.isInstanceOf[CodegenFallback])
    val gen = genEval(e, html).getUTF8String(0)
    assert(gen == e.nullSafeEval(UTF8String.fromString(html)))
    assert(genEval(e, null).isNullAt(0))
  }

  test("html_blocks: generated == interpreted, not CodegenFallback") {
    val e = HtmlBlocks(in)
    assert(!e.isInstanceOf[CodegenFallback])
    val gen = genEval(e, html).getArray(0)
    val int0 = e.nullSafeEval(UTF8String.fromString(html))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(gen.numElements() == int0.numElements())
    (0 until gen.numElements()).foreach { i =>
      val g = gen.getStruct(i, 2); val w = int0.getStruct(i, 2)
      assert(g.getUTF8String(0) == w.getUTF8String(0) && g.getInt(1) == w.getInt(1))
    }
  }

  test("html_meta: generated == interpreted, not CodegenFallback") {
    val e = HtmlMeta(in)
    assert(!e.isInstanceOf[CodegenFallback])
    val gen = genEval(e, html).getStruct(0, 7)
    assert(gen.getUTF8String(0).toString == "T & U")
    assert(gen.getUTF8String(2).toString == "http://ex.com/c")
    assert(gen.getUTF8String(3).toString == "en")
    assert(genEval(e, null).isNullAt(0))
  }

  test("canonical_url: generated == interpreted incl. IDN fold") {
    val e = CanonicalUrl(in)
    assert(!e.isInstanceOf[CodegenFallback])
    for (u <- Seq("HTTP://Ex.COM:80/a/../b#x", "http://bücher.example/p",
        "not a url")) {
      val gen = genEval(e, u).getUTF8String(0)
      assert(gen == e.nullSafeEval(UTF8String.fromString(u)), u)
    }
  }

  test("registered_domain: generated == interpreted incl. null-out") {
    val e = RegisteredDomain(in)
    assert(!e.isInstanceOf[CodegenFallback])
    val gen = genEval(e, "a.example.co.uk").getUTF8String(0)
    assert(gen.toString == "example.co.uk")
    // a public suffix has no registrable domain: generated null path
    assert(genEval(e, "co.uk").isNullAt(0))
    assert(genEval(e, null).isNullAt(0))
  }
}
