package graft.sources

import graft.SparkSpec

/** Pins [[OfficeText]]: docx WordprocessingML text walk, epub OCF →
  * OPF → spine resolution, writer round-trips, entity handling,
  * hostile containers, and the DataFrame router. */
class OfficeTextSpec extends SparkSpec {
  import spark.implicits._

  test("buildDocx round-trips: paragraphs, entities, tabs/breaks") {
    val paras = Seq("first paragraph", "second & <escaped>", "third \"quoted\"")
    val r = OfficeText.docxText(OfficeText.buildDocx(paras))
    assert(r.contains(paras.mkString("\n")))
  }

  test("wordMlText handles inline w:tab / w:br and skips non-text runs") {
    val xml =
      """<w:document xmlns:w="x"><w:body>""" +
        """<w:p><w:pPr><w:jc w:val="left"/></w:pPr>""" +
        """<w:r><w:t>a</w:t></w:r><w:r><w:tab/><w:t>b</w:t></w:r></w:p>""" +
        """<w:p><w:r><w:t xml:space="preserve"> kept </w:t></w:r>""" +
        """<w:r><w:br/></w:r><w:r><w:t>next</w:t></w:r></w:p>""" +
        """</w:body></w:document>"""
    assert(OfficeText.wordMlText(xml, 1 << 20) == "a\tb\n kept \nnext")
  }

  test("buildEpub round-trips: spine order, chapter structure") {
    val chapters = Seq(
      ("Intro", Seq("first para", "second para")),
      ("Body & More", Seq("third para")))
    val r = OfficeText.epubText(OfficeText.buildEpub(chapters))
    // per chapter: h1 title then body paragraphs (the <head>'s
    // <title> is stripped, never duplicated); chapters in spine order
    assert(r.contains(
      "Intro\nfirst para\nsecond para\nBody & More\nthird para"))
  }

  test("buildPptx round-trips: slide order, paragraphs, entities") {
    val slides = Seq(
      Seq("slide one title", "bullet & point"),
      Seq("slide <two> text"),
      Seq("third", "deck \"quoted\""))
    val r = OfficeText.pptxText(OfficeText.buildPptx(slides))
    assert(r.contains(slides.map(_.mkString("\n")).mkString("\n")))
  }

  test("drawingMlText: a:br inside a paragraph, multiple runs concatenate") {
    val xml = "<p:sld xmlns:a=\"x\"><p:txBody>" +
      "<a:p><a:r><a:t>run one</a:t></a:r><a:r><a:t> run two</a:t></a:r></a:p>" +
      "<a:p><a:r><a:t>before</a:t></a:r><a:br/><a:r><a:t>after</a:t></a:r></a:p>" +
      "</p:txBody></p:sld>"
    assert(OfficeText.drawingMlText(xml, 1 << 20) ==
      "run one run two\nbefore\nafter")
  }

  test("buildXlsx round-trips: shared strings AND native number cells") {
    val rows = Seq(
      Seq("700", "cell a", "cell b"),
      Seq("42", "cell a"), // repeated string: one sst entry, two refs
      Seq("name & co"))
    val r = OfficeText.xlsxText(OfficeText.buildXlsx(rows))
    assert(r.contains(rows.map(_.mkString("\t")).mkString("\n")))
  }

  test("sheetMlText: inlineStr cells, missing shared index, rich-run sst") {
    val sst = OfficeText.sharedStringTable(
      "<sst><si><t>plain</t></si>" +
        "<si><r><t>rich </t></r><r><t>run</t></r></si></sst>")
    assert(sst == IndexedSeq("plain", "rich run"))
    val sheet = "<worksheet><sheetData>" +
      "<row r=\"1\"><c r=\"A1\" t=\"s\"><v>1</v></c>" +
      "<c r=\"B1\" t=\"inlineStr\"><is><t>inline text</t></is></c>" +
      "<c r=\"C1\"><v>3.5</v></c></row>" +
      "<row r=\"2\"><c r=\"A2\" t=\"s\"><v>99</v></c>" + // out of range: empty
      "<c r=\"B2\" t=\"s\"><v>0</v></c></row>" +
      "</sheetData></worksheet>"
    assert(OfficeText.sheetMlText(sheet, sst, 1 << 20) ==
      "rich run\tinline text\t3.5\nplain")
  }

  test("buildOdt round-trips; odfText handles tab/line-break/text:s " +
       "and spans") {
    val paras = Seq("first odt para", "second & <escaped>", "tästy \"quotes\"")
    val r = OfficeText.odtText(OfficeText.buildOdt(paras))
    assert(r.contains(paras.mkString("\n")))
    val xml = "<office:document-content><office:body><office:text>" +
      "<text:p>a<text:tab/>b</text:p>" +
      "<text:p><text:span text:style-name=\"T1\">styled</text:span>" +
      " run<text:line-break/>next</text:p>" +
      "<text:p>one<text:s text:c=\"3\"/>gap</text:p>" +
      "<text:p/>" +
      "<text:h text:outline-level=\"1\">heading</text:h>" +
      "</office:text></office:body></office:document-content>"
    assert(OfficeText.odfText(xml, 1 << 20) ==
      "a\tb\nstyled run\nnext\none   gap\n\nheading")
  }

  test("hostile containers never throw and yield None") {
    val cases = Seq(
      Array.empty[Byte],
      "not a zip".getBytes("UTF-8"),
      OfficeText.buildDocx(Seq("x")).take(20).toArray, // truncated
      null)
    cases.foreach { b =>
      assert(OfficeText.docxText(b).isEmpty)
      assert(OfficeText.epubText(b).isEmpty)
    }
    // a plain zip with neither part: both None
    val plain = Archives.zipMembers(OfficeText.buildDocx(Seq("x")))
    assert(plain.nonEmpty) // sanity: the builder produced a walkable zip
  }

  test("bit-flip fuzz across both containers: any outcome but a throw") {
    val docx = OfficeText.buildDocx(Seq("alpha", "beta & gamma"))
    val epub = OfficeText.buildEpub(Seq(("T", Seq("p1", "p2"))))
    for (base <- Seq(docx, epub); i <- 0 until base.length by 11) {
      val mut = base.clone()
      mut(i) = (mut(i) ^ 0x5a).toByte
      OfficeText.docxText(mut); OfficeText.epubText(mut) // must not throw
    }
    (1 until docx.length by 37).foreach { n =>
      OfficeText.docxText(docx.take(n)); OfficeText.epubText(epub.take(n))
    }
  }

  test("inspectMedia names document containers: docx / epub / plain zip") {
    val zipOther = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      z.putNextEntry(new java.util.zip.ZipEntry("data.txt"))
      z.write("x".getBytes); z.closeEntry(); z.close()
      bos.toByteArray
    }
    val pay = Seq(
      (1L, OfficeText.buildDocx(Seq("d"))),
      (2L, OfficeText.buildEpub(Seq(("t", Seq("p"))))),
      (3L, zipOther)).toDF("doc_id", "payload")
    val rows = Multimodal.inspectMedia(
        Multimodal.asMedia(pay, "doc_id", "payload", "doc"))
      .orderBy("media_id").collect()
    assert(rows(0).getAs[String]("format") == "docx")
    assert(rows(1).getAs[String]("format") == "epub")
    assert(rows(2).getAs[String]("format") == "zip")
  }

  test("describeOfficeText routes docx / epub / other") {
    val pay = Seq(
      (1L, OfficeText.buildDocx(Seq("alpha", "beta"))),
      (2L, OfficeText.buildEpub(Seq(("T", Seq("p"))))),
      (3L, "neither".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val rows = OfficeText.describeOfficeText(
      Multimodal.asMedia(pay, "doc_id", "payload", "doc"))
      .orderBy("media_id").collect()
    assert(rows(0).getAs[String]("format") == "docx")
    assert(rows(0).getAs[String]("text") == "alpha\nbeta")
    assert(rows(0).getAs[Int]("n_members") == 3)
    assert(rows(1).getAs[String]("format") == "epub")
    assert(rows(1).getAs[Int]("n_members") == 4) // mimetype+container+opf+1
    assert(rows(2).isNullAt(rows(2).fieldIndex("format")))
  }
}
