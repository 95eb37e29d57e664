package graft.sources

import graft.SparkSpec

/** Pins [[Pdf.extractPdfText]] three ways:
  *
  *  1. round-trips of the engine's own deterministic writers
  *     ([[Pdf.buildSimplePdf]] raw + Flate, [[Pdf.buildXrefStreamPdf]]
  *     with ObjStm + predictor-12 xref stream) — the q285 contract;
  *  2. an INDEPENDENTLY hand-assembled fixture that shares no code
  *     with the writers and deliberately uses the constructs the
  *     writers don't (content-stream arrays, TJ kerning, hex strings,
  *     octal/paren escapes, an indirect /Length, /Differences with
  *     glyph names and uniXXXX) — so reader and writer can't be
  *     merely mutually consistent;
  *  3. hostile bytes (truncated, corrupted, garbage, huge claims) —
  *     the never-throw fence.
  */
class PdfSpec extends SparkSpec {
  import spark.implicits._

  private def pageText(pages: Seq[Seq[String]]): String =
    pages.map(_.mkString("\n")).mkString("\n")

  test("buildSimplePdf round-trips: raw and FlateDecode content") {
    val pages = Seq(
      Seq("first line", "second (with parens)", "café & crème"),
      Seq("page two solo"))
    for (flate <- Seq(false, true)) {
      val bytes = Pdf.buildSimplePdf(pages, flate)
      val r = Pdf.extractPdfText(bytes)
      assert(r.isDefined, s"flate=$flate")
      assert(r.get.nPages == 2)
      assert(r.get.version == "1.4")
      assert(r.get.text == pageText(pages), s"flate=$flate")
    }
  }

  test("buildXrefStreamPdf round-trips: xref stream + ObjStm + Up predictor") {
    val pages = Seq(
      Seq("alpha", "beta"),
      Seq("gamma"),
      Seq("delta", "epsilon", "zeta \\ backslash"))
    val bytes = Pdf.buildXrefStreamPdf(pages)
    val r = Pdf.extractPdfText(bytes)
    assert(r.isDefined)
    assert(r.get.nPages == 3)
    assert(r.get.version == "1.5")
    assert(r.get.text == pageText(pages))
  }

  /** Hand-assembled classic PDF sharing no code with the writers:
    * two /Contents streams (one plain, one Flate), indirect /Length,
    * TJ kerning (−50 no space, −400 space), hex string, octal é,
    * escaped parens, and a /Differences font (65→eacute, 66→uni0042).
    */
  private def handFixture(): Array[Byte] = {
    val c1 = "BT /Fa 12 Tf 50 700 Td [(Wor)-50(ld)-400(now)] TJ " +
      "T* (caf\\351 \\(ok\\)) Tj T* <48656C6C6F> Tj ET"
    val c2plain = "BT /Fb 12 Tf 50 600 Td (AB) Tj (cd) ' ET"
    val dfl = new java.util.zip.Deflater()
    val c2b = c2plain.getBytes("ISO-8859-1")
    dfl.setInput(c2b); dfl.finish()
    val cbuf = new Array[Byte](c2b.length + 64)
    val c2len = dfl.deflate(cbuf); dfl.end()

    val out = new java.io.ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    def obj(num: Int, body: String): Unit = {
      offsets += out.size
      w(s"$num 0 obj\n$body\nendobj\n")
    }
    w("%PDF-1.4\n")
    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, "<< /Type /Pages /Count 1 /Kids [3 0 R] >>")
    obj(3, "<< /Type /Page /Parent 2 0 R " +
      "/Resources << /Font << /Fa 6 0 R /Fb 7 0 R >> >> " +
      "/Contents [4 0 R 5 0 R] >>")
    // obj 4: plain content, /Length by INDIRECT reference (obj 8)
    offsets += out.size
    w(s"4 0 obj\n<< /Length 8 0 R >>\nstream\n$c1\nendstream\nendobj\n")
    // obj 5: flate content
    offsets += out.size
    w(s"5 0 obj\n<< /Length $c2len /Filter /FlateDecode >>\nstream\n")
    out.write(cbuf, 0, c2len)
    w("\nendstream\nendobj\n")
    obj(6, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding /WinAnsiEncoding >>")
    obj(7, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding << /BaseEncoding /WinAnsiEncoding " +
      "/Differences [65 /eacute /uni0042] >> >>")
    obj(8, c1.length.toString)
    val xrefAt = out.size
    w(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  test("independent hand fixture: arrays of contents, TJ kerning, hex, " +
       "octal, indirect Length, Differences") {
    val r = Pdf.extractPdfText(handFixture())
    assert(r.isDefined)
    assert(r.get.nPages == 1)
    // c1: TJ −50 joins, −400 becomes a space; T* breaks lines; octal
    // 351 is é in WinAnsi; <48656C6C6F> is Hello.
    // c2 (joined as the same page stream): BT after emitted text
    // breaks the line; /Fb maps A→é (eacute), B→B (uni0042); the '
    // operator breaks then shows.
    assert(r.get.text ==
      "World now\ncafé (ok)\nHello\néB\ncd")
  }

  test("hostile inputs never throw and yield None") {
    val good = Pdf.buildSimplePdf(Seq(Seq("x")), flate = true)
    val cases: Seq[Array[Byte]] = Seq(
      Array.empty[Byte],
      "not a pdf at all".getBytes("US-ASCII"),
      good.take(good.length / 2).toArray, // truncated mid-file
      good.take(12).toArray, // header only
      ("%PDF-1.4\nstartxref\n999999999\n%%EOF").getBytes("US-ASCII"),
      ("%PDF-1.4\nxref\ntrailer\n<< >>\nstartxref\n9\n%%EOF").getBytes("US-ASCII"),
      null)
    cases.foreach { bs =>
      assert(Pdf.extractPdfText(bs).isEmpty)
    }
    // bit-flip fuzz across the whole valid file: any outcome but a throw
    (0 until good.length by 7).foreach { i =>
      val mut = good.clone()
      mut(i) = (mut(i) ^ 0x55).toByte
      Pdf.extractPdfText(mut) // must not throw
    }
  }

  test("looksLikePdf tolerates a junk prefix, rejects non-PDF") {
    val good = Pdf.buildSimplePdf(Seq(Seq("y")), flate = false)
    assert(Pdf.looksLikePdf(good))
    assert(Pdf.looksLikePdf("junk".getBytes("US-ASCII") ++ good))
    assert(!Pdf.looksLikePdf("PDF- but no percent".getBytes("US-ASCII")))
    assert(!Pdf.looksLikePdf(null))
  }

  test("describePdf: mixed frame yields text rows and null rows, map-only") {
    val pay = Seq(
      (1L, Pdf.buildSimplePdf(Seq(Seq("hello pdf")), flate = false)),
      (2L, "plain text".getBytes("UTF-8")),
      (3L, Pdf.buildXrefStreamPdf(Seq(Seq("a"), Seq("b"))))
    ).toDF("doc_id", "payload")
    val media = Multimodal.asMedia(pay, "doc_id", "payload", "doc")
    val rows = Pdf.describePdf(media).orderBy("media_id").collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[String]("text") == "hello pdf")
    assert(rows(0).getAs[Int]("n_pages") == 1)
    assert(rows(1).isNullAt(rows(1).fieldIndex("text")))
    assert(rows(2).getAs[Int]("n_pages") == 2)
    assert(rows(2).getAs[String]("text") == "a\nb")
    // plan: no shuffle in the kernel
    val plan = Pdf.describePdf(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("inspectMedia names PDF payloads so curation can route them") {
    val pay = Seq(
      (1L, Pdf.buildSimplePdf(Seq(Seq("r")), flate = false)),
      (2L, "text".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val rows = Multimodal.inspectMedia(
      Multimodal.asMedia(pay, "doc_id", "payload", "doc"))
      .orderBy("media_id").collect()
    assert(rows(0).getAs[String]("format") == "pdf")
    assert(rows(0).isNullAt(rows(0).fieldIndex("width")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("format")))
  }

  test("warcDocText routes html AND pdf carriers, excludes the rest") {
    def rec(wtype: String, uri: String, payload: Array[Byte]): Array[Byte] = {
      val hdr = (s"WARC/1.0\r\nWARC-Type: $wtype\r\n" +
        (if (uri != null) s"WARC-Target-URI: $uri\r\n" else "") +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("ISO-8859-1")
      hdr ++ payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
    def http(status: Int, ctype: String, body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 $status OK\r\nContent-Type: $ctype\r\n\r\n")
        .getBytes("ISO-8859-1") ++ body
    val warc =
      rec("response", "http://x/h",
        http(200, "text/html", "<p>hi there</p>".getBytes("UTF-8"))) ++
      rec("response", "http://x/d.pdf",
        http(200, "application/pdf",
          Pdf.buildSimplePdf(Seq(Seq("pdf body")), flate = true))) ++
      rec("response", "http://x/broken.pdf",
        http(200, "application/pdf", "%PDF-1.4 truncated".getBytes("UTF-8"))) ++
      rec("response", "http://x/j",
        http(200, "application/json", "{}".getBytes("UTF-8")))
    val media = Multimodal.asMedia(
      Seq((7L, warc)).toDF("id", "w"), "id", "w", "warc")
    val rows = Warc.warcDocText(media).orderBy("record_idx").collect()
    assert(rows.length == 2) // json and the undecodable pdf route nowhere
    assert(rows(0).getAs[String]("carrier") == "html")
    assert(rows(0).getAs[String]("text") == "hi there")
    assert(rows(1).getAs[String]("carrier") == "pdf")
    assert(rows(1).getAs[String]("text") == "pdf body")
    assert(rows(1).getAs[String]("url") == "http://x/d.pdf")
  }

  test("maxPages and maxChars fences bound hostile-size documents") {
    val many = Pdf.buildSimplePdf((0 until 40).map(i => Seq(s"page $i")), flate = false)
    val r = Pdf.extractPdfText(many, maxPages = 5)
    assert(r.isDefined && r.get.nPages == 5)
    val r2 = Pdf.extractPdfText(many, maxChars = 10)
    assert(r2.isDefined && r2.get.text.length <= 10)
  }
}
