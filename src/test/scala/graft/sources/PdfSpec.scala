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

  test("buildType0Pdf round-trips through the /ToUnicode CMap: both " +
       "xref generations, shifted CIDs") {
    val pages = Seq(
      Seq("hello café Type0", "line (two) \\ ok"),
      Seq("page 2 solo"))
    for (xs <- Seq(false, true)) {
      val bytes = Pdf.buildType0Pdf(pages, xs)
      val r = Pdf.extractPdfText(bytes)
      assert(r.isDefined, s"xrefStream=$xs")
      assert(r.get.nPages == 2, s"xrefStream=$xs")
      assert(r.get.version == (if (xs) "1.5" else "1.4"))
      // the writer's CID scheme is codepoint + 0x100: getting THIS
      // string back proves the CMap was applied (the Identity
      // fallback would shift every character by 0x100)
      assert(r.get.text == pageText(pages), s"xrefStream=$xs")
    }
  }

  /** Hand-assembled Type0 fixture sharing no code with
    * [[Pdf.buildType0Pdf]]: a bfrange spanning a surrogate-free BMP
    * run (<0041>..<0043> → Greek Α Β Γ — dst last-unit increments), a
    * bfchar whose destination is TWO UTF-16 code units (the fi
    * expansion), an ARRAY-form bfrange, and one unmapped code that
    * must fall back to Identity. */
  private def type0HandFixture(): Array[Byte] = {
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |12 dict begin
        |begincmap
        |/CIDSystemInfo << /Registry (T) /Ordering (T) /Supplement 0 >> def
        |/CMapName /T-UCS def
        |/CMapType 2 def
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |1 beginbfchar
        |<00D0> <00660069>
        |endbfchar
        |2 beginbfrange
        |<0041> <0043> <0391>
        |<0050> <0051> [<0058> <0059>]
        |endbfrange
        |endcmap
        |CMapName currentdict /CMap defineresource pop
        |end
        |end
        |""".stripMargin
    // codes: 0041 0042 0043 (bfrange -> ΑΒΓ), 00D0 (bfchar -> fi),
    // 0050 0051 (array bfrange -> XY), 007A (unmapped -> Identity 'z')
    val c1 = "BT /F1 12 Tf 50 700 Td <004100420043> Tj " +
      "<00D0> Tj T* <00500051007A> Tj ET"
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
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>")
    obj(4, s"<< /Length ${c1.length} >>\nstream\n$c1\nendstream")
    obj(5, "<< /Type /Font /Subtype /Type0 /BaseFont /Any " +
      "/Encoding /Identity-H /DescendantFonts [6 0 R] /ToUnicode 7 0 R >>")
    obj(6, "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Any >>")
    obj(7, s"<< /Length ${cmap.length} >>\nstream\n$cmap\nendstream")
    val xrefAt = out.size
    w(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  test("independent Type0 hand fixture: bfrange over a BMP run, " +
       "two-unit bfchar, array bfrange, Identity fallback") {
    val r = Pdf.extractPdfText(type0HandFixture())
    assert(r.isDefined)
    assert(r.get.nPages == 1)
    assert(r.get.text == "ΑΒΓfi\nXYz")
  }

  test("hostile bfrange: the last destination unit never wraps past " +
       "0xFFFF or walks into the surrogate block") {
    def cmap(body: String): java.util.HashMap[Int, String] =
      Pdf.parseToUnicodeCMap(
        (s"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" +
          body).getBytes("ISO-8859-1"))
    // dst base <FFFE> over 256 codes: only the first two units exist
    val wrap = cmap("1 beginbfrange\n<0000> <00FF> <FFFE>\nendbfrange\n")
    assert(wrap.get(0) == "\ufffe" && wrap.get(1) == "\uffff")
    assert(wrap.get(2) == null && wrap.get(0xff) == null)
    // dst base <D7FE>: stops before U+D800 (never a lone surrogate)
    val sur = cmap("1 beginbfrange\n<0010> <0020> <D7FE>\nendbfrange\n")
    assert(sur.get(0x10) == "\ud7fe" && sur.get(0x11) == "\ud7ff")
    assert(sur.get(0x12) == null && sur.get(0x20) == null)
    // a well-formed range is untouched by the clamp
    val ok = cmap("1 beginbfrange\n<0041> <0043> <0391>\nendbfrange\n")
    assert(ok.get(0x41) == "Α" && ok.get(0x43) == "Γ")
  }

  test("a Type0 font with NO /ToUnicode decodes via Identity (never " +
       "throws, never mojibakes low codes)") {
    val c1 = "BT /F1 12 Tf 50 700 Td <00680069> Tj ET"
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
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>")
    obj(4, s"<< /Length ${c1.length} >>\nstream\n$c1\nendstream")
    obj(5, "<< /Type /Font /Subtype /Type0 /BaseFont /Any " +
      "/Encoding /Identity-H /DescendantFonts [6 0 R] >>")
    obj(6, "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Any >>")
    val xrefAt = out.size
    w(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n")
    val r = Pdf.extractPdfText(out.toByteArray)
    assert(r.isDefined)
    assert(r.get.text == "hi")
  }

  test("extraction confidence: type0_codes/type0_unmapped count the " +
       "Identity-fallback fraction") {
    // simple font: no composite codes at all
    val simple = Pdf.extractPdfText(
      Pdf.buildSimplePdf(Seq(Seq("plain")), flate = false)).get
    assert((simple.type0Codes, simple.type0Unmapped) == ((0L, 0L)))
    // clean Type0: every code goes through the CMap
    val clean = Pdf.extractPdfText(
      Pdf.buildType0Pdf(Seq(Seq("clean type0 line")), xrefStream = false)).get
    assert(clean.type0Codes == "clean type0 line".length.toLong)
    assert(clean.type0Unmapped == 0L)
    // no /ToUnicode: the text still replays (CID == codepoint) but
    // EVERY code is flagged unmapped — the gate's signal
    val subset = Pdf.extractPdfText(
      Pdf.buildType0PdfNoToUnicode(Seq(Seq("subset moji line")))).get
    assert(subset.text == "subset moji line")
    assert(subset.type0Codes == "subset moji line".length.toLong)
    assert(subset.type0Unmapped == subset.type0Codes)
    // the independent hand fixture: exactly ONE unmapped code (007A)
    val hand = Pdf.extractPdfText(type0HandFixture()).get
    assert(hand.type0Unmapped == 1L)
    assert(hand.type0Codes == 7L) // 3 + 1 + 3 shown codes
  }

  test("an /Encrypt trailer bails explicitly (None, not garbage text)") {
    val plain = Pdf.buildSimplePdf(Seq(Seq("secret")), flate = false)
    assert(Pdf.extractPdfText(plain).isDefined)
    // patch the trailer to declare encryption — extraction must bail
    // rather than emit RC4/AES ciphertext as "text"
    val s = new String(plain, "ISO-8859-1")
    val enc = s.replace("/Root 1 0 R", "/Root 1 0 R /Encrypt 99 0 R")
      .getBytes("ISO-8859-1")
    assert(Pdf.extractPdfText(enc).isEmpty)
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

  test("warcDocText routes all five carriers: html, pdf, markdown, docx, epub") {
    def rec(uri: String, ctype: String, body: Array[Byte]): Array[Byte] = {
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n\r\n")
        .getBytes("ISO-8859-1") ++ body
      val hdr = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes("ISO-8859-1")
      hdr ++ http ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
    val warc =
      rec("http://x/h", "text/html", "<p>page text</p>".getBytes("UTF-8")) ++
      rec("http://x/d.pdf", "application/pdf",
        Pdf.buildSimplePdf(Seq(Seq("pdf text")), flate = false)) ++
      rec("http://x/r.md", "text/markdown",
        "# Head\n\n- md item\n".getBytes("UTF-8")) ++
      rec("http://x/w.docx",
        "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
        OfficeText.buildDocx(Seq("docx para"))) ++
      rec("http://x/b.epub", "application/epub+zip",
        OfficeText.buildEpub(Seq(("Ch", Seq("epub para")))))
    val media = Multimodal.asMedia(
      Seq((5L, warc)).toDF("id", "w"), "id", "w", "warc")
    val rows = Warc.warcDocText(media).orderBy("record_idx")
      .select("carrier", "text").as[(String, String)].collect().toSeq
    assert(rows == Seq(
      ("html", "page text"),
      ("pdf", "pdf text"),
      ("markdown", "Head\nmd item"),
      ("docx", "docx para"),
      ("epub", "Ch\nepub para")), rows.toString)
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

  // --- filter tier: LZW / ASCII85 / RunLength ----------------------

  /** Spec-side TIFF-LZW encoder (MSB-first, EarlyChange=1) mirroring
    * the decoder's width schedule from the DECODER's dictionary size
    * — the roundtrip fails loudly if either side's 9→12-bit
    * transitions drift. */
  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0; var codeLen = 9
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << codeLen) | code; bitCnt += codeLen
      while (bitCnt >= 8) {
        out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt); bitCnt -= 8
      }
    }
    val dict = scala.collection.mutable.HashMap.empty[String, Int]
    def key(bs: Seq[Byte]) = bs.map(b => (b & 0xff).toChar).mkString
    (0 until 256).foreach(i => dict(key(Seq(i.toByte))) = i)
    put(256)
    var nextCode = 258
    var emitted = 0
    var decSize = 258 // the DECODER's table size after reading emit #k
    def emit(code: Int): Unit = {
      put(code); emitted += 1
      if (emitted >= 2) decSize += 1 // decoder adds from its 2nd code on
      if (codeLen < 12 && decSize + 1 >= (1 << codeLen)) codeLen += 1
    }
    var cur = Vector.empty[Byte]
    data.foreach { b =>
      val next = cur :+ b
      if (dict.contains(key(next))) cur = next
      else {
        emit(dict(key(cur)))
        if (nextCode < 4096) { dict(key(next)) = nextCode; nextCode += 1 }
        cur = Vector(b)
      }
    }
    if (cur.nonEmpty) emit(dict(key(cur)))
    put(257)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  private def ascii85Encode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    var i = 0
    while (i < data.length) {
      val n = math.min(4, data.length - i)
      var v = 0L
      (0 until 4).foreach { k =>
        v = (v << 8) | (if (k < n) data(i + k) & 0xff else 0)
      }
      if (n == 4 && v == 0) sb.append('z')
      else {
        val cs = new Array[Char](5)
        var vv = v
        (4 to 0 by -1).foreach { k => cs(k) = ('!' + (vv % 85)).toChar; vv /= 85 }
        sb.appendAll(cs, 0, n + 1)
      }
      i += n
    }
    sb.append("~>")
    sb.toString.getBytes("US-ASCII")
  }

  test("lzwDecode: hand-computed TIFF-LZW vector and width-crossing roundtrip") {
    // "AAAA" = codes 256,65,258,65,257 at 9 bits, MSB-first
    val vec = Array(0x80, 0x10, 0x60, 0x44, 0x18, 0x08).map(_.toByte)
    assert(Pdf.lzwDecode(vec, 1, 1 << 20).map(new String(_, "US-ASCII"))
      .contains("AAAA"))
    // long compressible input crosses the 9->10->11-bit boundaries
    val rnd = new scala.util.Random(14)
    val body = ("the quick brown fox jumps over the lazy dog " * 400).getBytes ++
      Array.fill(2000)(rnd.nextInt(256).toByte)
    val round = Pdf.lzwDecode(lzwEncode(body), 1, 1 << 22)
    assert(round.exists(java.util.Arrays.equals(_, body)))
    // fence: output cap makes oversized streams None, not OOM
    assert(Pdf.lzwDecode(lzwEncode(body), 1, 100).isEmpty)
    // hostile: a code past the table is corrupt, never a throw
    // (bits: 256 clear, then 511 — far beyond the 258-entry table)
    assert(Pdf.lzwDecode(Array(0x80.toByte, 0x7F.toByte, 0xC0.toByte), 1, 100).isEmpty)
  }

  test("ascii85Decode: the classic vector, z-groups, partial tails, roundtrip") {
    def dec(s: String) = Pdf.ascii85Decode(s.getBytes("US-ASCII"))
      .map(new String(_, "ISO-8859-1"))
    assert(dec("9jqo^~>").contains("Man "))
    assert(dec("z~>").contains("    "))
    val rnd = new scala.util.Random(85)
    (0 until 20).foreach { n =>
      val body = Array.fill(n)(rnd.nextInt(256).toByte)
      val round = Pdf.ascii85Decode(ascii85Encode(body))
      assert(round.exists(java.util.Arrays.equals(_, body)), s"len $n")
    }
    assert(dec("v~>").isEmpty) // char past 'u' is corrupt
  }

  test("runLengthDecode: literals, runs, EOD") {
    val enc = Array[Byte](2, 'a', 'b', 'c', (257 - 4).toByte, 'x',
      0, 'q', 128.toByte, 9, 'z')
    assert(new String(Pdf.runLengthDecode(enc), "US-ASCII") == "abcxxxxq")
  }

  test("a PDF with an [ASCII85 -> LZW] filter chain extracts end to end") {
    val content = "BT /F1 12 Tf 72 720 Td (chained filters) Tj ET"
    val enc = ascii85Encode(lzwEncode(content.getBytes("ISO-8859-1")))
    val out = new java.io.ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    def obj(num: Int, body: String): Unit = {
      offsets += out.size; w(s"$num 0 obj\n$body\nendobj\n")
    }
    w("%PDF-1.4\n")
    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, "<< /Type /Pages /Count 1 /Kids [3 0 R] >>")
    obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    offsets += out.size
    w(s"4 0 obj\n<< /Length ${enc.length} " +
      "/Filter [/ASCII85Decode /LZWDecode] >>\nstream\n")
    out.write(enc)
    w("\nendstream\nendobj\n")
    val xrefAt = out.size
    w(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n")
    val r = Pdf.extractPdfText(out.toByteArray)
    assert(r.map(_.text).contains("chained filters"))
  }

  test("maxPages and maxChars fences bound hostile-size documents") {
    val many = Pdf.buildSimplePdf((0 until 40).map(i => Seq(s"page $i")), flate = false)
    val r = Pdf.extractPdfText(many, maxPages = 5)
    assert(r.isDefined && r.get.nPages == 5)
    val r2 = Pdf.extractPdfText(many, maxChars = 10)
    assert(r2.isDefined && r2.get.text.length <= 10)
  }
}
