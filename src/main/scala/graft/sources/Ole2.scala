package graft.sources

/** OLE2 Compound File Binary (MS-CFB) reader and the legacy
  * binary-Word text path (MS-DOC) — the pre-2007 office carrier
  * still common in old crawls and e-mail attachments.
  *
  * CFB: header → DIFAT (109 header entries + DIFAT sector chain) →
  * FAT → directory chain (linear entry walk; the red-black sibling
  * tree is an index, not the contract) → per-stream reads through
  * the FAT, or through the miniFAT inside the root entry's mini
  * stream for streams under the 4096-byte cutoff. Both 512-byte (v3)
  * and 4096-byte (v4) sectors.
  *
  * DOC: FIB (wIdent 0xA5EC) → fWhichTblStm picks 0Table/1Table →
  * Clx at fcClx/lcbClx in the table stream → Pcdt piece table →
  * pieces decoded as cp1252 (fCompressed, fc/2) or UTF-16LE, main
  * document range only (ccpText) → Word control characters mapped
  * (0x0D paragraph, 0x07 cell, field chars 0x13/0x14/0x15 with the
  * instruction leg dropped — the RTF \fldinst discipline).
  *
  * Every walk is fenced (sector-count guards against FAT cycles,
  * stream-size caps) and total: hostile bytes yield None, never a
  * throw. Reference surface: hadoop has no counterpart; formats per
  * the public MS-CFB/MS-DOC specifications.
  */
object Ole2 {

  private val FreeSect = 0xffffffff
  private val EndOfChain = 0xfffffffe
  private val FatSect = 0xfffffffd
  private val DifSect = 0xfffffffc

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  def looksLikeCfb(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 &&
      (b(0) & 0xff) == 0xd0 && (b(1) & 0xff) == 0xcf &&
      (b(2) & 0xff) == 0x11 && (b(3) & 0xff) == 0xe0 &&
      (b(4) & 0xff) == 0xa1 && (b(5) & 0xff) == 0xb1 &&
      (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0xe1

  /** One stream of a compound file. `name` drops the directory
    * entry's terminating NUL; control-prefixed names (…) kept. */
  final case class CfbStream(name: String, bytes: Array[Byte])

  /** Reads every stream of a CFB container. None on anything
    * malformed; per-stream and total size fenced. */
  def readCfb(bytes: Array[Byte],
              maxStream: Int = 1 << 24): Option[Seq[CfbStream]] = {
    try {
      if (!looksLikeCfb(bytes) || bytes.length < 512) return None
      val sectorShift = u16(bytes, 0x1e)
      if (sectorShift != 9 && sectorShift != 12) return None
      val ss = 1 << sectorShift
      val nFat = i32(bytes, 0x2c)
      val dirStart = i32(bytes, 0x30)
      val miniCutoff = i32(bytes, 0x38)
      val miniFatStart = i32(bytes, 0x3c)
      val nMiniFat = i32(bytes, 0x40)
      val difStart = i32(bytes, 0x44)
      val nDif = i32(bytes, 0x48)
      val totalSectors = math.max(0, (bytes.length - 512) / ss)
      def sectorOff(s: Int): Int = 512 + s * ss

      // DIFAT: 109 header entries + chained DIFAT sectors
      val fatSectors = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < 109 && fatSectors.length < nFat) {
        val v = i32(bytes, 0x4c + 4 * i)
        if (v != FreeSect && v >= 0) fatSectors += v
        i += 1
      }
      var dif = difStart
      var guard = 0
      while (dif != EndOfChain && dif >= 0 && guard <= nDif &&
             guard < (1 << 16)) {
        guard += 1
        val o = sectorOff(dif)
        if (o + ss > bytes.length) return None
        val perSector = ss / 4 - 1
        var k = 0
        while (k < perSector && fatSectors.length < nFat) {
          val v = i32(bytes, o + 4 * k)
          if (v != FreeSect && v >= 0) fatSectors += v
          k += 1
        }
        dif = i32(bytes, o + ss - 4)
      }

      // FAT
      val fat = new Array[Int](fatSectors.length * (ss / 4))
      var fi = 0
      fatSectors.foreach { fs =>
        val o = sectorOff(fs)
        if (o + ss > bytes.length) return None
        var k = 0
        while (k < ss / 4) { fat(fi) = i32(bytes, o + 4 * k); fi += 1; k += 1 }
      }

      def chain(start: Int, cap: Long): Array[Byte] = {
        val out = new java.io.ByteArrayOutputStream()
        var s = start
        var g = 0
        while (s != EndOfChain && s >= 0 && s < fat.length &&
               g < totalSectors + 2 && out.size < cap) {
          g += 1
          val o = sectorOff(s)
          if (o + ss > bytes.length) return out.toByteArray
          out.write(bytes, o, ss)
          s = fat(s)
        }
        out.toByteArray
      }

      // directory entries
      val dirBytes = chain(dirStart, 1 << 22)
      val entries = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int, Long)]
      var e = 0
      while ((e + 1) * 128 <= dirBytes.length && e < (1 << 14)) {
        val o = e * 128
        val nameLen = u16(dirBytes, o + 0x40)
        val tpe = dirBytes(o + 0x42) & 0xff
        if (tpe != 0 && nameLen >= 2 && nameLen <= 64) {
          val name = new String(dirBytes, o, nameLen - 2, "UTF-16LE")
          val start = i32(dirBytes, o + 0x74)
          val size = (i32(dirBytes, o + 0x78) & 0xffffffffL) |
            ((i32(dirBytes, o + 0x7c) & 0xffffffffL) << 32)
          entries += ((name, tpe, start, size))
        }
        e += 1
      }
      val root = entries.find(_._2 == 5).getOrElse(return None)

      // mini stream (the root entry's regular chain) + miniFAT
      lazy val miniStream = chain(root._3, math.min(root._4, maxStream))
      lazy val miniFat: Array[Int] = {
        val mfBytes = chain(miniFatStart, nMiniFat.toLong * ss + ss)
        val mf = new Array[Int](mfBytes.length / 4)
        var k = 0
        while (k < mf.length) { mf(k) = i32(mfBytes, 4 * k); k += 1 }
        mf
      }
      def miniChain(start: Int, cap: Long): Array[Byte] = {
        val out = new java.io.ByteArrayOutputStream()
        var s = start
        var g = 0
        while (s != EndOfChain && s >= 0 && s < miniFat.length &&
               g < miniFat.length + 2 && out.size < cap) {
          g += 1
          val o = s * 64
          if (o + 64 <= miniStream.length) out.write(miniStream, o, 64)
          s = miniFat(s)
        }
        out.toByteArray
      }

      Some(entries.toSeq.collect { case (name, 2, start, size) =>
        val cap = math.min(size, maxStream)
        val raw =
          if (size < miniCutoff) miniChain(start, cap + 64)
          else chain(start, cap + ss)
        CfbStream(name, java.util.Arrays.copyOf(raw,
          math.min(cap, raw.length.toLong).toInt))
      })
    } catch { case _: Throwable => None }
  }

  /** MS-DOC (binary Word) → training text through the piece table.
    * None for anything that is not a readable .doc. */
  def docToText(bytes: Array[Byte], maxChars: Int = 1 << 22): Option[String] = {
    try {
      val streams = readCfb(bytes).getOrElse(return None)
      val wd = streams.find(_.name == "WordDocument").map(_.bytes)
        .getOrElse(return None)
      if (wd.length < 0x01aa || u16(wd, 0) != 0xa5ec) return None
      val flags = u16(wd, 0x0a)
      val tblName = if ((flags & 0x0200) != 0) "1Table" else "0Table"
      val table = streams.find(_.name == tblName).map(_.bytes)
        .getOrElse(return None)
      val ccpText = i32(wd, 0x4c)
      val fcClx = i32(wd, 0x01a2)
      val lcbClx = i32(wd, 0x01a6)
      if (ccpText <= 0 || fcClx < 0 || lcbClx <= 0 ||
          fcClx.toLong + lcbClx > table.length) return None

      // Clx: RgPrc (0x01 + cb(2) + grpprl) entries, then Pcdt (0x02)
      var p = fcClx
      val clxEnd = fcClx + lcbClx
      while (p < clxEnd && (table(p) & 0xff) == 0x01) {
        val cb = u16(table, p + 1)
        p += 3 + cb
      }
      if (p >= clxEnd || (table(p) & 0xff) != 0x02) return None
      val lcbPlc = i32(table, p + 1)
      val plc = p + 5
      if (lcbPlc < 4 + 12 || plc.toLong + lcbPlc > clxEnd ||
          plc.toLong + lcbPlc > table.length) return None
      val n = (lcbPlc - 4) / 12
      def cp(k: Int): Int = i32(table, plc + 4 * k)
      def pcdFc(k: Int): Int = i32(table, plc + 4 * (n + 1) + 8 * k + 2)

      val sb = new StringBuilder
      var remaining = math.min(ccpText, maxChars)
      var k = 0
      while (k < n && remaining > 0) {
        val len = math.min(cp(k + 1) - cp(k), remaining)
        if (len < 0) return None
        val fcRaw = pcdFc(k)
        val compressed = (fcRaw & 0x40000000) != 0
        val fc = fcRaw & 0x3fffffff
        if (compressed) {
          val off = fc / 2
          if (off < 0 || off.toLong + len > wd.length) return None
          sb.append(new String(wd, off, len, "windows-1252"))
        } else {
          if (fc < 0 || fc.toLong + 2L * len > wd.length) return None
          sb.append(new String(wd, fc, 2 * len, "UTF-16LE"))
        }
        remaining -= len
        k += 1
      }

      // Word control characters → the text contract
      val out = new StringBuilder(sb.length)
      var inFieldInstr = false
      var ci = 0
      while (ci < sb.length) {
        val c = sb.charAt(ci)
        c match {
          case 0x13 => inFieldInstr = true // field begin: drop instr leg
          case 0x14 => inFieldInstr = false // separator: result shows
          case 0x15 => inFieldInstr = false // field end
          case _ if inFieldInstr => // dropped
          case 0x0d | 0x0b | 0x0c => out.append('\n')
          case 0x07 => out.append('\t') // cell / row mark
          case 0x1e => out.append('-') // non-breaking hyphen
          case 0x1f => // optional hyphen: drops
          case 0x01 | 0x02 | 0x05 | 0x08 => // anchors/objects: drop
          case 0xa0 => out.append(' ')
          case _ if c >= 0x20 || c == '\t' => out.append(c)
          case _ => // remaining control chars drop
        }
        ci += 1
      }
      // whitespace contract: trim line ends, drop empties, join \n
      val cleaned = new StringBuilder(out.length)
      out.toString.split("\n", -1).foreach { ln =>
        val t = ln.trim
        if (t.nonEmpty) {
          if (cleaned.nonEmpty) cleaned.append('\n')
          cleaned.append(t)
        }
      }
      Some(cleaned.toString)
    } catch { case _: Throwable => None }
  }

  // ---------------------------------------------------------------
  // .xls: BIFF8 Workbook stream → text (MS-XLS §2.1.7)
  // ---------------------------------------------------------------

  /** Record-boundary-aware cursor over a BIFF8 stream: SST character
    * data may split across CONTINUE (0x003C) records, and a split
    * inside a string's characters re-states the high-byte flag as a
    * fresh grbit byte at the continuation start (MS-XLS §2.5.293).
    * Fixed fields read across boundaries transparently. */
  private final class BiffCursor(b: Array[Byte],
                                 recs: IndexedSeq[(Int, Int, Int)],
                                 var ri: Int) {
    var pos: Int = recs(ri)._2
    private def recEnd: Int = recs(ri)._2 + recs(ri)._3
    def remaining: Int = recEnd - pos
    private def nextContinue(): Unit = {
      if (ri + 1 >= recs.length || recs(ri + 1)._1 != 0x003c)
        throw new RuntimeException("biff: truncated")
      ri += 1
      pos = recs(ri)._2
    }
    def u8(): Int = {
      if (remaining == 0) nextContinue()
      val v = b(pos) & 0xff; pos += 1; v
    }
    def u16(): Int = u8() | (u8() << 8)
    def i32(): Int = u16() | (u16() << 16)
    def skip(n: Int): Unit = {
      var left = n
      while (left > 0) {
        if (remaining == 0) nextContinue()
        val t = math.min(left, remaining)
        pos += t; left -= t
      }
    }
    /** cch characters, starting single/double per `high0`; each
      * CONTINUE boundary inside the character run carries a fresh
      * grbit byte whose bit 0 re-declares the width. */
    def chars(cch: Int, high0: Boolean): String = {
      val sb = new StringBuilder
      var left = cch
      var high = high0
      while (left > 0) {
        if (remaining == 0) {
          nextContinue()
          high = (u8() & 1) != 0
        }
        val w = if (high) 2 else 1
        val take = math.min(left, remaining / w)
        if (take <= 0) throw new RuntimeException("biff: split mid-char")
        if (high) sb.append(new String(b, pos, 2 * take, "UTF-16LE"))
        else sb.append(new String(b, pos, take, "windows-1252"))
        pos += take * w
        left -= take
      }
      sb.toString
    }
  }

  /** Renders a BIFF numeric cell the way a text extractor states it:
    * integral doubles print without a decimal point. */
  private def fmtXlsNum(d: Double): String =
    if (!d.isInfinite && !d.isNaN && d == math.rint(d) &&
        math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  /** RK-encoded number (MS-XLS §2.5.276): bit 0 = ÷100, bit 1 =
    * integer (30-bit signed) vs truncated-IEEE mantissa. */
  private def rkToDouble(rk: Int): Double = {
    val v =
      if ((rk & 2) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xfffffffcL) << 32)
    if ((rk & 1) != 0) v / 100 else v
  }

  /** MS-XLS (binary Excel, BIFF8) → text: the Workbook stream's
    * globals substream feeds the SST (CONTINUE-aware); each
    * worksheet substream's cell records (LABELSST, LABEL, NUMBER,
    * RK, MULRK, BOOLERR, FORMULA+STRING) flush at its EOF as rows
    * of tab-joined non-empty cells, rows newline-joined, sheets
    * newline-joined — the same text contract as
    * [[OfficeText.xlsxText]]. None for anything unreadable. */
  def xlsToText(bytes: Array[Byte], maxChars: Int = 1 << 22): Option[String] = {
    try {
      val streams = readCfb(bytes).getOrElse(return None)
      val wb = streams.find(s => s.name == "Workbook" || s.name == "Book")
        .map(_.bytes).getOrElse(return None)
      // record index: (type, payloadStart, payloadLen)
      val recs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
      var o = 0
      while (o + 4 <= wb.length && recs.length < (1 << 20)) {
        val t = u16(wb, o)
        val len = u16(wb, o + 2)
        if (o + 4 + len > wb.length) return None
        recs += ((t, o + 4, len))
        o += 4 + len
      }
      if (recs.isEmpty || recs(0)._1 != 0x0809) return None

      val sst = scala.collection.mutable.ArrayBuffer.empty[String]
      val cells =
        scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
      val out = new StringBuilder
      var emittedSheet = false
      var inSheet = false
      // a string FORMULA's value arrives in the NEXT STRING record
      var wantFormulaString = false
      def flushSheet(): Unit = {
        if (emittedSheet) out.append('\n')
        emittedSheet = true
        var lastRow = Int.MinValue
        var rowHas = false
        cells.sortBy(c => (c._1, c._2)).foreach { case (r, _, v) =>
          if (v.nonEmpty) {
            if (r != lastRow && lastRow != Int.MinValue && rowHas)
              out.append('\n')
            if (r == lastRow && rowHas) out.append('\t')
            out.append(v)
            rowHas = true
            lastRow = r
          }
        }
        cells.clear()
      }
      var k = 0
      while (k < recs.length && out.length < maxChars) {
        val (t, ps, len) = recs(k)
        t match {
          case 0x0809 => // BOF: dt at +2 — 0x0005 globals, 0x0010 sheet
            inSheet = len >= 4 && u16(wb, ps + 2) == 0x0010
          case 0x000a => // EOF
            if (inSheet) flushSheet()
            inSheet = false
          case 0x00fc => // SST: cstTotal, cstUnique, strings (CONTINUE-aware)
            val cur = new BiffCursor(wb, recs.toIndexedSeq, k)
            cur.i32()
            val unique = cur.i32()
            var s = 0
            while (s < math.min(unique, 1 << 20) && sst.length < (1 << 20)) {
              val cch = cur.u16()
              val flags = cur.u8()
              val cRun = if ((flags & 0x08) != 0) cur.u16() else 0
              val cbExt = if ((flags & 0x04) != 0) cur.i32() else 0
              sst += cur.chars(cch, (flags & 0x01) != 0)
              cur.skip(4 * cRun + math.max(0, cbExt))
              s += 1
            }
            k = cur.ri // consumed CONTINUEs
          case 0x00fd if inSheet && len >= 10 => // LABELSST
            val row = u16(wb, ps); val col = u16(wb, ps + 2)
            val isst = i32(wb, ps + 6)
            sst.lift(isst).foreach(v => cells += ((row, col, v)))
          case 0x0204 if inSheet && len >= 9 => // LABEL (inline string)
            val row = u16(wb, ps); val col = u16(wb, ps + 2)
            val cur = new BiffCursor(wb, recs.toIndexedSeq, k)
            cur.skip(6)
            val cch = cur.u16()
            val flags = cur.u8()
            cells += ((row, col, cur.chars(cch, (flags & 0x01) != 0)))
            k = cur.ri
          case 0x0203 if inSheet && len >= 14 => // NUMBER
            val row = u16(wb, ps); val col = u16(wb, ps + 2)
            var bits = 0L
            var i = 0
            while (i < 8) { bits |= (wb(ps + 6 + i) & 0xffL) << (8 * i); i += 1 }
            cells += ((row, col,
              fmtXlsNum(java.lang.Double.longBitsToDouble(bits))))
          case 0x027e if inSheet && len >= 10 => // RK
            val row = u16(wb, ps); val col = u16(wb, ps + 2)
            cells += ((row, col, fmtXlsNum(rkToDouble(i32(wb, ps + 6)))))
          case 0x00bd if inSheet && len >= 12 => // MULRK
            val row = u16(wb, ps); val colFirst = u16(wb, ps + 2)
            val n = (len - 6) / 6
            var i = 0
            while (i < n) {
              cells += ((row, colFirst + i,
                fmtXlsNum(rkToDouble(i32(wb, ps + 4 + 6 * i + 2)))))
              i += 1
            }
          case 0x0205 if inSheet && len >= 8 => // BOOLERR
            val row = u16(wb, ps); val col = u16(wb, ps + 2)
            if ((wb(ps + 7) & 0xff) == 0) // fError=0: a boolean
              cells += ((row, col,
                if ((wb(ps + 6) & 0xff) != 0) "TRUE" else "FALSE"))
          case 0x0006 if inSheet && len >= 14 => // FORMULA: cached value
            val row = u16(wb, ps); val col = u16(wb, ps + 2)
            if (u16(wb, ps + 12) == 0xffff) {
              // non-numeric cache: byte 6 tags it; 0 = string follows
              if ((wb(ps + 6) & 0xff) == 0) wantFormulaString = true
            } else {
              var bits = 0L
              var i = 0
              while (i < 8) {
                bits |= (wb(ps + 6 + i) & 0xffL) << (8 * i); i += 1
              }
              cells += ((row, col,
                fmtXlsNum(java.lang.Double.longBitsToDouble(bits))))
            }
            // the STRING record has no (row, col): remember the cell
            if (wantFormulaString) cells += ((row, col, ""))
          case 0x0207 if inSheet && wantFormulaString && len >= 3 => // STRING
            wantFormulaString = false
            val cur = new BiffCursor(wb, recs.toIndexedSeq, k)
            val cch = cur.u16()
            val flags = cur.u8()
            val v = cur.chars(cch, (flags & 0x01) != 0)
            k = cur.ri
            // fill the placeholder planted by the FORMULA record
            val at = cells.lastIndexWhere(_._3.isEmpty)
            if (at >= 0) cells(at) = (cells(at)._1, cells(at)._2, v)
          case _ =>
        }
        k += 1
      }
      if (inSheet) flushSheet() // truncated file: flush what we have
      if (out.length > maxChars) out.setLength(maxChars)
      Some(out.toString)
    } catch { case _: Throwable => None }
  }

  // ---------------------------------------------------------------
  // .ppt: PowerPoint Document stream → text (MS-PPT §2.3)
  // ---------------------------------------------------------------

  /** MS-PPT (binary PowerPoint) → text: recursive record walk of the
    * "PowerPoint Document" stream (containers are recVer 0xF),
    * harvesting TextCharsAtom (0x0FA0, UTF-16LE) and TextBytesAtom
    * (0x0FA8, cp1252) in stream order — the catppt posture: text
    * lives in SlideListWithText and client textboxes, and both are
    * containers above these two atom types. PPT's in-atom paragraph
    * mark is CR (and VT for soft breaks): both become newlines; the
    * whitespace contract (trim, drop empties, join) matches
    * [[docToText]]. None for anything unreadable. */
  def pptToText(bytes: Array[Byte], maxChars: Int = 1 << 22): Option[String] = {
    try {
      val streams = readCfb(bytes).getOrElse(return None)
      val pd = streams.find(_.name == "PowerPoint Document").map(_.bytes)
        .getOrElse(return None)
      val raw = new StringBuilder
      def walk(lo: Int, hi: Int, depth: Int): Unit = {
        var o = lo
        while (o + 8 <= hi && raw.length < maxChars) {
          val verInst = u16(pd, o)
          val recType = u16(pd, o + 2)
          val len = i32(pd, o + 4)
          if (len < 0 || o + 8 + len > hi) return // malformed: stop loudly
          if ((verInst & 0x0f) == 0x0f && depth < 16) {
            walk(o + 8, o + 8 + len, depth + 1)
          } else recType match {
            case 0x0fa0 => // TextCharsAtom
              raw.append(new String(pd, o + 8, len & ~1, "UTF-16LE"))
              raw.append('\r')
            case 0x0fa8 => // TextBytesAtom
              raw.append(new String(pd, o + 8, len, "windows-1252"))
              raw.append('\r')
            case _ =>
          }
          o += 8 + len
        }
      }
      walk(0, pd.length, 0)
      val cleaned = new StringBuilder(raw.length)
      raw.toString.replace('\u000B', '\r').split("\r", -1).foreach { ln =>
        val t = ln.trim
        if (t.nonEmpty) {
          if (cleaned.nonEmpty) cleaned.append('\n')
          cleaned.append(t)
        }
      }
      if (cleaned.length > maxChars) cleaned.setLength(maxChars)
      Some(cleaned.toString)
    } catch { case _: Throwable => None }
  }

  // ---------------------------------------------------------------
  // Deterministic writer (fixture + oracle synthesis)
  // ---------------------------------------------------------------

  /** Builds a real .doc: a v3 CFB with a WordDocument stream (FIB +
    * piece texts at deliberately NON-monotonic offsets, alternating
    * cp1252-compressed and UTF-16 pieces) and a small 1Table stream
    * carried in the MINI stream (so the miniFAT path is exercised on
    * every fixture). `paragraphs` join with the 0x0D paragraph mark;
    * a `field` pair plants an instruction leg that must drop. */
  def buildDoc(paragraphs: Seq[String],
               field: Option[(String, String)] = None): Array[Byte] = {
    val fieldText = field.map { case (instr, result) =>
      "" + instr + "" + result + ""
    }.getOrElse("")
    val text = paragraphs.mkString("\r") + (if (fieldText.isEmpty) ""
      else "\r" + fieldText)

    // split into three pieces: cp1252 / UTF-16 / cp1252-able tail as
    // UTF-16 again (out of fc order in the stream)
    def cp1252able(s: String): Boolean = {
      val enc = java.nio.charset.Charset.forName("windows-1252").newEncoder()
      s.forall(c => c != 0x13 && c != 0x14 && c != 0x15 && enc.canEncode(c)) &&
        new String(s.getBytes("windows-1252"), "windows-1252") == s
    }
    val third = math.max(1, text.length / 3)
    val rawPieces = Seq(
      text.substring(0, third),
      text.substring(third, math.min(text.length, 2 * third)),
      text.substring(math.min(text.length, 2 * third)))
      .filter(_.nonEmpty)
    val pieces = rawPieces.zipWithIndex.map { case (s, i) =>
      (s, i % 2 == 0 && cp1252able(s)) // compressed on even pieces
    }

    // FIB: 0x01aa zeroed bytes + the handful of live fields
    val fibLen = 0x01b0
    val wdOut = new java.io.ByteArrayOutputStream()
    wdOut.write(new Array[Byte](fibLen), 0, fibLen)
    // piece data appended LAST-first so fcs are non-monotonic
    val fcs = new Array[Int](pieces.length)
    pieces.zipWithIndex.reverse.foreach { case ((s, comp), i) =>
      fcs(i) = wdOut.size
      val b = if (comp) s.getBytes("windows-1252") else s.getBytes("UTF-16LE")
      wdOut.write(b, 0, b.length)
    }
    val wd = wdOut.toByteArray
    def putU16(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def putI32(b: Array[Byte], o: Int, v: Int): Unit = {
      putU16(b, o, v & 0xffff); putU16(b, o + 2, (v >> 16) & 0xffff)
    }
    putU16(wd, 0, 0xa5ec) // wIdent
    putU16(wd, 2, 0x00c1) // nFib (Word 97)
    putU16(wd, 0x0a, 0x0200) // fWhichTblStm -> 1Table
    putI32(wd, 0x4c, text.length) // ccpText

    // table stream: Clx = one Prc (exercises the skip) + Pcdt
    val tbl = new java.io.ByteArrayOutputStream()
    tbl.write(0x01); tbl.write(2); tbl.write(0) // Prc: cb=2
    tbl.write(0xab); tbl.write(0xcd) // grpprl bytes (opaque)
    tbl.write(0x02) // Pcdt
    val nPieces = pieces.length
    val lcbPlc = 4 * (nPieces + 1) + 8 * nPieces
    def w32(o: java.io.ByteArrayOutputStream, v: Int): Unit =
      (0 until 4).foreach(k => o.write((v >> (8 * k)) & 0xff))
    w32(tbl, lcbPlc)
    var cpAcc = 0
    w32(tbl, 0)
    pieces.foreach { case (s, _) => cpAcc += s.length; w32(tbl, cpAcc) }
    pieces.zipWithIndex.foreach { case ((_, comp), i) =>
      tbl.write(0); tbl.write(0) // PCD flags
      val fcRaw = if (comp) (fcs(i) * 2) | 0x40000000 else fcs(i)
      w32(tbl, fcRaw)
      tbl.write(0); tbl.write(0) // prm
    }
    val fcClx = 0 // Clx at the table stream start... except the Prc
    putI32(wd, 0x01a2, fcClx)
    putI32(wd, 0x01a6, tbl.size)
    val table = tbl.toByteArray

    buildCfb(Seq(("WordDocument", wd), ("1Table", table)))
  }

  /** Builds a real BIFF8 .xls: Workbook globals substream (BOF,
    * BOUNDSHEET, SST, EOF) + one worksheet substream. Cell encoding
    * is deterministic by position — all-digit values become native
    * numbers (runs of ≥2 adjacent → one MULRK, singles alternate
    * NUMBER/RK by (row+col) parity), strings route through the SST
    * as LABELSST except every (row+col)%3==0 cell, which is an
    * inline LABEL — so one fixture exercises every cell record the
    * reader handles. `continueSplit` breaks the SST's LAST string's
    * character data across a CONTINUE record with the re-stated
    * grbit byte (MS-XLS §2.5.293). */
  def buildXls(rows: Seq[Seq[String]],
               continueSplit: Boolean = false): Array[Byte] = {
    def w16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      o.write(v & 0xff); o.write((v >> 8) & 0xff)
    }
    def w32b(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      w16(o, v & 0xffff); w16(o, (v >> 16) & 0xffff)
    }
    def rec(o: java.io.ByteArrayOutputStream, t: Int,
            payload: Array[Byte]): Unit = {
      w16(o, t); w16(o, payload.length); o.write(payload, 0, payload.length)
    }
    def cp1252able(s: String): Boolean = {
      val enc = java.nio.charset.Charset.forName("windows-1252").newEncoder()
      s.forall(enc.canEncode) &&
        new String(s.getBytes("windows-1252"), "windows-1252") == s
    }
    def isNum(s: String): Boolean = s.nonEmpty && s.forall(_.isDigit) &&
      s.length <= 15
    // XLUnicodeString bytes: cch(u16) flags(u8) chars
    def xlStr(s: String): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      val comp = cp1252able(s)
      w16(o, s.length); o.write(if (comp) 0 else 1)
      val b = if (comp) s.getBytes("windows-1252") else s.getBytes("UTF-16LE")
      o.write(b, 0, b.length)
      o.toByteArray
    }

    // SST membership: string cells NOT chosen as inline LABEL
    val sstStrings = scala.collection.mutable.LinkedHashSet.empty[String]
    var sstRefs = 0
    rows.zipWithIndex.foreach { case (r, ri) =>
      r.zipWithIndex.foreach { case (v, ci) =>
        if (v.nonEmpty && !isNum(v) && (ri + ci) % 3 != 0) {
          sstStrings += v; sstRefs += 1
        }
      }
    }
    val sstIdx = sstStrings.zipWithIndex.toMap

    // sheet substream
    val sh = new java.io.ByteArrayOutputStream()
    val bofSheet = new java.io.ByteArrayOutputStream()
    w16(bofSheet, 0x0600); w16(bofSheet, 0x0010)
    bofSheet.write(new Array[Byte](12), 0, 12)
    rec(sh, 0x0809, bofSheet.toByteArray)
    rows.zipWithIndex.foreach { case (r, ri) =>
      var ci = 0
      while (ci < r.length) {
        val v = r(ci)
        if (v.isEmpty) { ci += 1 }
        else if (isNum(v)) {
          // extend the run of adjacent numeric cells
          var cj = ci
          while (cj + 1 < r.length && isNum(r(cj + 1))) cj += 1
          val runFits = (ci to cj).forall { k =>
            val n = r(k).toLong; n >= -(1L << 29) && n < (1L << 29)
          }
          if (cj > ci && runFits) { // MULRK
            val p = new java.io.ByteArrayOutputStream()
            w16(p, ri); w16(p, ci)
            (ci to cj).foreach { k =>
              w16(p, 0) // ixfe
              w32b(p, (r(k).toInt << 2) | 2)
            }
            w16(p, cj)
            rec(sh, 0x00bd, p.toByteArray)
            ci = cj + 1
          } else {
            val n = v.toLong
            val p = new java.io.ByteArrayOutputStream()
            w16(p, ri); w16(p, ci); w16(p, 0)
            if ((ri + ci) % 2 == 0 || n < -(1L << 29) || n >= (1L << 29)) {
              // NUMBER: IEEE double
              val bits = java.lang.Double.doubleToLongBits(n.toDouble)
              (0 until 8).foreach(k => p.write(((bits >> (8 * k)) & 0xff).toInt))
              rec(sh, 0x0203, p.toByteArray)
            } else { // RK integer
              w32b(p, (n.toInt << 2) | 2)
              rec(sh, 0x027e, p.toByteArray)
            }
            ci += 1
          }
        } else if ((ri + ci) % 3 == 0) { // inline LABEL
          val p = new java.io.ByteArrayOutputStream()
          w16(p, ri); w16(p, ci); w16(p, 0)
          val xs = xlStr(v); p.write(xs, 0, xs.length)
          rec(sh, 0x0204, p.toByteArray)
          ci += 1
        } else { // LABELSST
          val p = new java.io.ByteArrayOutputStream()
          w16(p, ri); w16(p, ci); w16(p, 0)
          w32b(p, sstIdx(v))
          rec(sh, 0x00fd, p.toByteArray)
          ci += 1
        }
      }
    }
    rec(sh, 0x000a, Array.emptyByteArray)
    val sheetBytes = sh.toByteArray

    // globals substream (BOUNDSHEET.lbPlyPos patched afterward)
    val g = new java.io.ByteArrayOutputStream()
    val bofG = new java.io.ByteArrayOutputStream()
    w16(bofG, 0x0600); w16(bofG, 0x0005)
    bofG.write(new Array[Byte](12), 0, 12)
    rec(g, 0x0809, bofG.toByteArray)
    val bsPos = g.size() + 4 // offset of lbPlyPos inside the stream
    val bs = new java.io.ByteArrayOutputStream()
    w32b(bs, 0) // placeholder lbPlyPos
    w16(bs, 0) // visible worksheet
    // ShortXLUnicodeString name
    bs.write(6); bs.write(0)
    bs.write("Sheet1".getBytes("windows-1252"), 0, 6)
    rec(g, 0x0085, bs.toByteArray)
    // SST (+ optional CONTINUE split inside the last string's chars)
    val sstBody = new java.io.ByteArrayOutputStream()
    w32b(sstBody, sstRefs); w32b(sstBody, sstStrings.size)
    val strs = sstStrings.toSeq
    strs.dropRight(1).foreach { s =>
      val xs = xlStr(s); sstBody.write(xs, 0, xs.length)
    }
    if (strs.isEmpty) rec(g, 0x00fc, sstBody.toByteArray)
    else {
      val last = strs.last
      val comp = cp1252able(last)
      if (!continueSplit || last.length < 2) {
        val xs = xlStr(last); sstBody.write(xs, 0, xs.length)
        rec(g, 0x00fc, sstBody.toByteArray)
      } else {
        // first half of the chars in the SST record, rest in a
        // CONTINUE that re-states the width flag
        val cut = last.length / 2
        w16(sstBody, last.length); sstBody.write(if (comp) 0 else 1)
        val head = last.substring(0, cut)
        val hb = if (comp) head.getBytes("windows-1252")
          else head.getBytes("UTF-16LE")
        sstBody.write(hb, 0, hb.length)
        rec(g, 0x00fc, sstBody.toByteArray)
        val cont = new java.io.ByteArrayOutputStream()
        cont.write(if (comp) 0 else 1) // fresh grbit
        val tail = last.substring(cut)
        val tb = if (comp) tail.getBytes("windows-1252")
          else tail.getBytes("UTF-16LE")
        cont.write(tb, 0, tb.length)
        rec(g, 0x003c, cont.toByteArray)
      }
    }
    rec(g, 0x000a, Array.emptyByteArray)
    val globals = g.toByteArray
    // patch lbPlyPos: sheet BOF offset = globals length
    val wb = new java.io.ByteArrayOutputStream()
    wb.write(globals, 0, globals.length)
    wb.write(sheetBytes, 0, sheetBytes.length)
    val all = wb.toByteArray
    val sheetOff = globals.length
    all(bsPos) = (sheetOff & 0xff).toByte
    all(bsPos + 1) = ((sheetOff >> 8) & 0xff).toByte
    all(bsPos + 2) = ((sheetOff >> 16) & 0xff).toByte
    all(bsPos + 3) = ((sheetOff >> 24) & 0xff).toByte

    buildCfb(Seq(("Workbook", all)))
  }

  /** Builds a real binary .ppt: a CFB with a "PowerPoint Document"
    * stream — DocumentContainer > SlideListWithText > per slide a
    * SlidePersistAtom then per paragraph TextHeaderAtom + the text
    * atom (cp1252-able paragraphs on even (slide+para) parity become
    * TextBytesAtom, everything else TextCharsAtom, so every fixture
    * exercises both). */
  def buildPpt(slides: Seq[Seq[String]]): Array[Byte] = {
    def w16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      o.write(v & 0xff); o.write((v >> 8) & 0xff)
    }
    def w32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      w16(o, v & 0xffff); w16(o, (v >> 16) & 0xffff)
    }
    def rec(o: java.io.ByteArrayOutputStream, verInst: Int, t: Int,
            payload: Array[Byte]): Unit = {
      w16(o, verInst); w16(o, t); w32(o, payload.length)
      o.write(payload, 0, payload.length)
    }
    def cp1252able(s: String): Boolean = {
      val enc = java.nio.charset.Charset.forName("windows-1252").newEncoder()
      s.forall(enc.canEncode) &&
        new String(s.getBytes("windows-1252"), "windows-1252") == s
    }
    val slwt = new java.io.ByteArrayOutputStream()
    slides.zipWithIndex.foreach { case (paras, si) =>
      rec(slwt, 0x0000, 0x03f3, new Array[Byte](20)) // SlidePersistAtom
      paras.zipWithIndex.foreach { case (p, pi) =>
        val th = new java.io.ByteArrayOutputStream()
        w32(th, 0) // txType: title — irrelevant to extraction
        rec(slwt, 0x0000, 0x0f9f, th.toByteArray) // TextHeaderAtom
        if (cp1252able(p) && (si + pi) % 2 == 0)
          rec(slwt, 0x0000, 0x0fa8, p.getBytes("windows-1252"))
        else
          rec(slwt, 0x0000, 0x0fa0, p.getBytes("UTF-16LE"))
      }
    }
    val doc = new java.io.ByteArrayOutputStream()
    rec(doc, 0x000f, 0x0ff0, slwt.toByteArray) // SlideListWithText
    val pd = new java.io.ByteArrayOutputStream()
    rec(pd, 0x000f, 0x03e8, doc.toByteArray) // DocumentContainer
    buildCfb(Seq(
      ("Current User", new Array[Byte](24)),
      ("PowerPoint Document", pd.toByteArray)))
  }

  /** Minimal v3 CFB writer: header-embedded DIFAT, one FAT sector,
    * one directory sector, one miniFAT sector; streams under the
    * 4096 cutoff go through the mini stream. */
  def buildCfb(streams: Seq[(String, Array[Byte])]): Array[Byte] = {
    require(streams.size <= 3, "fixture writer: at most three streams")
    val ss = 512
    def sectors(n: Int): Int = (n + ss - 1) / ss
    // layout: 0 FAT | 1 directory | 2 miniFAT | big streams | mini stream
    val big = streams.filter(_._2.length >= 4096)
    val small = streams.filter(_._2.length < 4096)
    // mini stream: small streams at 64-byte mini sectors
    val mini = new java.io.ByteArrayOutputStream()
    val miniStarts = small.map { case (_, b) =>
      val at = mini.size / 64
      mini.write(b, 0, b.length)
      while (mini.size % 64 != 0) mini.write(0)
      at
    }
    val miniBytes = mini.toByteArray
    var next = 3
    val bigStarts = big.map { case (_, b) =>
      val at = next; next += sectors(b.length); at
    }
    val miniStreamStart = if (miniBytes.nonEmpty) next else EndOfChain
    if (miniBytes.nonEmpty) next += sectors(miniBytes.length)
    val totalSectors = next

    val out = new Array[Byte](512 + totalSectors * ss)
    def putU16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def putI32(o: Int, v: Int): Unit = {
      putU16(o, v & 0xffff); putU16(o + 2, (v >>> 16) & 0xffff)
    }
    // header
    val magic = Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1)
    magic.zipWithIndex.foreach { case (v, i) => out(i) = v.toByte }
    putU16(0x18, 0x003e); putU16(0x1a, 0x0003) // minor/major
    putU16(0x1c, 0xfffe) // byte order
    putU16(0x1e, 9); putU16(0x20, 6) // sector shifts
    putI32(0x2c, 1) // one FAT sector
    putI32(0x30, 1) // directory start
    putI32(0x38, 4096) // mini cutoff
    putI32(0x3c, 2); putI32(0x40, 1) // miniFAT start/count
    putI32(0x44, EndOfChain); putI32(0x48, 0) // no DIFAT sectors
    putI32(0x4c, 0) // DIFAT[0] -> FAT sector 0
    var i = 1
    while (i < 109) { putI32(0x4c + 4 * i, FreeSect); i += 1 }

    // FAT (sector 0)
    val fatOff = 512
    i = 0
    while (i < ss / 4) { putI32(fatOff + 4 * i, FreeSect); i += 1 }
    putI32(fatOff, FatSect) // sector 0: the FAT itself
    putI32(fatOff + 4, EndOfChain) // directory
    putI32(fatOff + 8, EndOfChain) // miniFAT
    def chainFat(start: Int, n: Int): Unit = {
      var k = 0
      while (k < n) {
        putI32(fatOff + 4 * (start + k),
          if (k == n - 1) EndOfChain else start + k + 1)
        k += 1
      }
    }
    big.zip(bigStarts).foreach { case ((_, b), st) =>
      chainFat(st, sectors(b.length))
    }
    if (miniBytes.nonEmpty) chainFat(miniStreamStart, sectors(miniBytes.length))

    // miniFAT (sector 2)
    val mfOff = 512 + 2 * ss
    i = 0
    while (i < ss / 4) { putI32(mfOff + 4 * i, FreeSect); i += 1 }
    small.zip(miniStarts).foreach { case ((_, b), st) =>
      val n = (b.length + 63) / 64
      var k = 0
      while (k < n) {
        putI32(mfOff + 4 * (st + k), if (k == n - 1) EndOfChain else st + k + 1)
        k += 1
      }
    }

    // directory (sector 1): Root + streams
    val dirOff = 512 + ss
    def dirEntry(slot: Int, name: String, tpe: Int, start: Int,
                 size: Long, child: Int, right: Int): Unit = {
      val o = dirOff + slot * 128
      val nb = name.getBytes("UTF-16LE")
      System.arraycopy(nb, 0, out, o, math.min(nb.length, 62))
      putU16(o + 0x40, nb.length + 2)
      out(o + 0x42) = tpe.toByte
      out(o + 0x43) = 1 // black
      putI32(o + 0x44, -1) // left
      putI32(o + 0x48, right)
      putI32(o + 0x4c, child)
      putI32(o + 0x74, start)
      putI32(o + 0x78, (size & 0xffffffffL).toInt)
      putI32(o + 0x7c, 0)
    }
    // free slots: object type 0 (already zeroed)
    val ordered = big.zip(bigStarts).map { case ((n, b), st) =>
      (n, b.length.toLong, st)
    } ++ small.zip(miniStarts).map { case ((n, b), st) =>
      (n, b.length.toLong, st)
    }
    dirEntry(0, "Root Entry", 5,
      if (miniBytes.nonEmpty) miniStreamStart else EndOfChain,
      miniBytes.length.toLong, child = 1, right = -1)
    ordered.zipWithIndex.foreach { case ((n, sz, st), k) =>
      dirEntry(1 + k, n, 2, st, sz,
        child = -1, right = if (k + 1 < ordered.length) 2 + k else -1)
    }

    // stream payloads
    big.zip(bigStarts).foreach { case ((_, b), st) =>
      System.arraycopy(b, 0, out, 512 + st * ss, b.length)
    }
    if (miniBytes.nonEmpty)
      System.arraycopy(miniBytes, 0, out, 512 + miniStreamStart * ss,
        miniBytes.length)
    out
  }
}
