package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pure-JVM PDF text extraction — the biggest text carrier in a web
  * crawl after HTML, and the piece that lets the curation tier route
  * `application/pdf` bodies into the same training-text pipeline as
  * the HTML tier (reference analogue: the text-extraction role that
  * `hadoop-streaming`'s record readers play for line-oriented text,
  * e.g. `hadoop-tools/hadoop-streaming/src/main/java/org/apache/
  * hadoop/streaming/StreamXmlRecordReader.java:1` — here applied to
  * the PDF container, which the reference never handles).
  *
  * Everything below is written from the public PDF 1.7 spec
  * (ISO 32000-1): the cross-reference machinery (classic `xref`
  * tables AND PDF 1.5 cross-reference streams with /Prev chaining and
  * /XRefStm hybrids), compressed object streams (/Type /ObjStm),
  * stream filters (FlateDecode through the same `java.util.zip`
  * inflate loop the PNG decoder in [[Multimodal]] uses, with PNG
  * predictors 1/2/10–15; ASCIIHexDecode), the page tree walk with
  * attribute inheritance, and a content-stream interpreter for the
  * text-showing operators (Tj, TJ, ', ") with the text-positioning
  * operators (Td, TD, Tm, T*, TL) mapped to line breaks and simple
  * font encodings (WinAnsi, MacRoman, Standard, /Differences with
  * glyph names incl. `uniXXXX`) mapped to Unicode.
  *
  * Scale posture: extraction is a per-partition flatMap kernel —
  * payload bytes never shuffle, memory per record is bounded by the
  * explicit `maxChars`/`maxObjects` fences, and a hostile or
  * truncated payload yields nulls, never a thrown exception (the
  * never-throw contract every [[Multimodal]] decoder obeys).
  */
object Pdf {

  // ---------------------------------------------------------------
  // Object model
  // ---------------------------------------------------------------

  /** One parsed PDF object (ISO 32000-1 §7.3). Streams carry their
    * RAW (still-filtered) bytes; [[decodeStream]] applies filters. */
  sealed trait PObj
  final case class PNum(v: Double) extends PObj {
    def toLong: Long = v.toLong
    def toInt: Int = v.toInt
  }
  final case class PStr(bytes: Array[Byte]) extends PObj
  final case class PName(v: String) extends PObj
  final case class PBool(v: Boolean) extends PObj
  case object PNull extends PObj
  final case class PArr(items: Vector[PObj]) extends PObj
  final case class PDict(m: Map[String, PObj]) extends PObj {
    def get(k: String): Option[PObj] = m.get(k)
  }
  final case class PRef(num: Int, gen: Int) extends PObj
  final case class PStream(dict: PDict, raw: Array[Byte]) extends PObj

  // ---------------------------------------------------------------
  // Lexer / object parser
  // ---------------------------------------------------------------

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' || c == 0
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  /** Mutable-cursor token reader over the whole file's bytes.
    * Positions are Ints (payload cells are in-memory byte arrays; the
    * multi-GB path streams whole FILES per task upstream, so a single
    * payload past 2 GiB is already fenced off before it gets here). */
  private final class Lexer(val b: Array[Byte], var pos: Int) {
    def peek: Int = if (pos < b.length) b(pos) & 0xff else -1

    def skipWs(): Unit = {
      var going = true
      while (going) {
        while (pos < b.length && isWs(b(pos) & 0xff)) pos += 1
        if (peek == '%') { // comment to EOL
          while (pos < b.length && b(pos) != '\n' && b(pos) != '\r') pos += 1
        } else going = false
      }
    }

    /** Reads one regular token (keyword / number body). */
    def token(): String = {
      skipWs()
      val start = pos
      while (pos < b.length && !isWs(b(pos) & 0xff) && !isDelim(b(pos) & 0xff))
        pos += 1
      new String(b, start, pos - start, "US-ASCII")
    }

    def expect(kw: String): Boolean = {
      skipWs()
      val save = pos
      if (token() == kw) true else { pos = save; false }
    }

    /** Parses one object at the cursor (after whitespace). Collapses
      * `n g R` into [[PRef]] by two-int lookahead with restore. */
    def parseObject(depth: Int): PObj = {
      if (depth > 64) throw new IllegalStateException("pdf depth")
      skipWs()
      val c = peek
      if (c == -1) throw new IllegalStateException("pdf eof")
      if (c == '<') {
        if (pos + 1 < b.length && b(pos + 1) == '<') parseDict(depth)
        else parseHexString()
      } else if (c == '(') parseLiteralString()
      else if (c == '/') parseName()
      else if (c == '[') parseArray(depth)
      else if (c == ']' || c == '>' || c == '}' || c == ')') {
        throw new IllegalStateException("pdf stray delim")
      } else {
        val save = pos
        val t = token()
        t match {
          case "true"  => PBool(true)
          case "false" => PBool(false)
          case "null"  => PNull
          case _ =>
            val d = parseNumber(t).getOrElse {
              pos = save
              throw new IllegalStateException(s"pdf token $t")
            }
            // two-integer + R lookahead → indirect reference
            if (d >= 0 && d == math.floor(d) && d <= Int.MaxValue) {
              val save2 = pos
              skipWs()
              val t2 = token()
              val g = parseNumber(t2)
              if (g.exists(x => x >= 0 && x == math.floor(x))) {
                val save3 = pos
                skipWs()
                if (token() == "R") return PRef(d.toInt, g.get.toInt)
                pos = save3
              }
              pos = save2
            }
            PNum(d)
        }
      }
    }

    private def parseNumber(t: String): Option[Double] =
      if (t.isEmpty) None
      else try {
        // PDF numbers: optional sign, digits, optional '.'; ".5" legal
        if (t.exists(ch => !(ch.isDigit || ch == '+' || ch == '-' || ch == '.')))
          None
        else Some(java.lang.Double.parseDouble(if (t == "." ) "0" else t))
      } catch { case _: NumberFormatException => None }

    private def parseName(): PName = {
      pos += 1 // '/'
      val sb = new StringBuilder
      while (pos < b.length && !isWs(b(pos) & 0xff) && !isDelim(b(pos) & 0xff)) {
        val ch = b(pos) & 0xff
        if (ch == '#' && pos + 2 < b.length) {
          val hx = Character.digit(b(pos + 1), 16)
          val lx = Character.digit(b(pos + 2), 16)
          if (hx >= 0 && lx >= 0) { sb.append(((hx << 4) | lx).toChar); pos += 3 }
          else { sb.append(ch.toChar); pos += 1 }
        } else { sb.append(ch.toChar); pos += 1 }
      }
      PName(sb.toString)
    }

    private def parseLiteralString(): PStr = {
      pos += 1 // '('
      val out = new java.io.ByteArrayOutputStream()
      var nesting = 1
      while (nesting > 0 && pos < b.length) {
        val ch = b(pos) & 0xff
        pos += 1
        if (ch == '\\') {
          if (pos < b.length) {
            val e = b(pos) & 0xff
            pos += 1
            e match {
              case 'n' => out.write('\n')
              case 'r' => out.write('\r')
              case 't' => out.write('\t')
              case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '(' => out.write('(')
              case ')' => out.write(')')
              case '\\' => out.write('\\')
              case '\r' => if (peek == '\n') pos += 1 // line continuation
              case '\n' => // line continuation
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'; var k = 1
                while (k < 3 && pos < b.length &&
                       b(pos) >= '0' && b(pos) <= '7') {
                  v = v * 8 + (b(pos) - '0'); pos += 1; k += 1
                }
                out.write(v & 0xff)
              case other => out.write(other) // spec: backslash ignored
            }
          }
        } else if (ch == '(') { nesting += 1; out.write(ch) }
        else if (ch == ')') { nesting -= 1; if (nesting > 0) out.write(ch) }
        else if (ch == '\r') { // EOL in string → LF
          out.write('\n'); if (peek == '\n') pos += 1
        } else out.write(ch)
      }
      PStr(out.toByteArray)
    }

    private def parseHexString(): PStr = {
      pos += 1 // '<'
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      var done = false
      while (!done && pos < b.length) {
        val ch = b(pos) & 0xff
        pos += 1
        if (ch == '>') done = true
        else {
          val d = Character.digit(ch, 16)
          if (d >= 0) {
            if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
          }
        }
      }
      if (hi >= 0) out.write(hi << 4) // odd count: pad trailing 0
      PStr(out.toByteArray)
    }

    private def parseArray(depth: Int): PArr = {
      pos += 1 // '['
      val items = Vector.newBuilder[PObj]
      skipWs()
      while (peek != ']' && peek != -1) {
        items += parseObject(depth + 1)
        skipWs()
      }
      if (peek == ']') pos += 1
      PArr(items.result())
    }

    private def parseDict(depth: Int): PDict = {
      pos += 2 // '<<'
      val m = Map.newBuilder[String, PObj]
      skipWs()
      while (!(peek == '>' && pos + 1 < b.length && b(pos + 1) == '>') &&
             peek != -1) {
        val k = parseObject(depth + 1)
        val v = parseObject(depth + 1)
        k match { case PName(n) => m += n -> v; case _ => }
        skipWs()
      }
      if (peek == '>') pos += 2
      PDict(m.result())
    }
  }

  // ---------------------------------------------------------------
  // Filters
  // ---------------------------------------------------------------

  /** Inflates `data` up to `maxOut` bytes (fence, not failure: a
    * stream that would exceed the fence returns what fit — the text
    * fence downstream caps anyway). Same Inflater discipline as the
    * PNG IDAT loop in [[Multimodal]]. */
  private def inflate(data: Array[Byte], maxOut: Int): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(math.min(maxOut, 1 << 16))
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished() && out.size < maxOut) {
        val n = inf.inflate(buf)
        if (n == 0) {
          if (inf.needsInput() || inf.needsDictionary()) return None
        } else out.write(buf, 0, math.min(n, maxOut - out.size))
      }
      Some(out.toByteArray)
    } catch { case _: java.util.zip.DataFormatException => None }
    finally inf.end()
  }

  /** PNG predictor post-pass (ISO 32000-1 §7.4.4.4; predictors 10–15
    * are the PNG per-row filters, 2 is TIFF horizontal, 1 none).
    * Cross-reference streams in the wild are almost always
    * Flate+Predictor 12 (Up). `colors*bpc/8` is the byte distance. */
  private def unpredict(data: Array[Byte], predictor: Int, columns: Int,
                        colors: Int, bpc: Int): Option[Array[Byte]] = {
    if (predictor <= 1) return Some(data)
    val bpp = math.max(1, colors * bpc / 8)
    val rowLen = columns * bpp
    if (rowLen <= 0) return None
    if (predictor == 2) { // TIFF horizontal differencing
      val out = data.clone()
      var r = 0
      while ((r + 1) * rowLen <= out.length) {
        var i = r * rowLen + bpp
        while (i < (r + 1) * rowLen) {
          out(i) = ((out(i) + out(i - bpp)) & 0xff).toByte; i += 1
        }
        r += 1
      }
      return Some(out)
    }
    // PNG predictors: each row is 1 filter byte + rowLen data bytes
    val stride = rowLen + 1
    val nRows = data.length / stride
    val out = new Array[Byte](nRows * rowLen)
    val prev = new Array[Int](rowLen)
    var r = 0
    while (r < nRows) {
      val ft = data(r * stride) & 0xff
      var i = 0
      while (i < rowLen) {
        val x = data(r * stride + 1 + i) & 0xff
        val a = if (i >= bpp) out(r * rowLen + i - bpp) & 0xff else 0
        val bUp = prev(i)
        val cUl = if (i >= bpp && r > 0) out((r - 1) * rowLen + i - bpp) & 0xff else 0
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + bUp
          case 3 => x + ((a + bUp) >> 1)
          case 4 =>
            val p = a + bUp - cUl
            val pa = math.abs(p - a); val pb = math.abs(p - bUp)
            val pc = math.abs(p - cUl)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) bUp else cUl)
          case _ => return None
        }
        out(r * rowLen + i) = (v & 0xff).toByte
        i += 1
      }
      i = 0
      while (i < rowLen) { prev(i) = out(r * rowLen + i) & 0xff; i += 1 }
      r += 1
    }
    Some(out)
  }

  /** PDF LZWDecode (ISO 32000-1 §7.4.4.2): TIFF-style LZW — MSB-first
    * bit packing (GIF's mirror image), 9→12-bit codes, 256=clear,
    * 257=EOD, and the EarlyChange quirk (default 1: the code width
    * grows one entry EARLY). Output fenced to `maxOut`. */
  private[sources] def lzwDecode(data: Array[Byte], earlyChange: Int,
                                 maxOut: Int): Option[Array[Byte]] = {
    if (data == null || data.isEmpty) return Some(Array.emptyByteArray)
    val out = new java.io.ByteArrayOutputStream(math.min(maxOut, 1 << 12))
    val dict = new Array[Array[Byte]](4096)
    var i = 0
    while (i < 256) { dict(i) = Array(i.toByte); i += 1 }
    var dictSize = 258
    var codeLen = 9
    var prev: Array[Byte] = null
    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    def nextCode(): Int = {
      while (bitCnt < codeLen) {
        if (pos >= data.length) return -1
        bitBuf = (bitBuf << 8) | (data(pos) & 0xff); pos += 1; bitCnt += 8
      }
      val c = ((bitBuf >> (bitCnt - codeLen)) & ((1L << codeLen) - 1)).toInt
      bitCnt -= codeLen
      c
    }
    var going = true
    while (going) {
      val c = nextCode()
      if (c == -1 || c == 257) going = false // EOD (or data exhausted)
      else if (c == 256) { // clear table
        dictSize = 258; codeLen = 9; prev = null
      } else {
        val entry =
          if (c < dictSize && dict(c) != null) dict(c)
          else if (c == dictSize && prev != null) prev :+ prev(0)
          else return None // code past the table: corrupt
        if (out.size + entry.length > maxOut) return None // fence
        out.write(entry, 0, entry.length)
        if (prev != null && dictSize < 4096) {
          dict(dictSize) = prev :+ entry(0); dictSize += 1
        }
        prev = entry
        if (codeLen < 12 && dictSize + earlyChange >= (1 << codeLen))
          codeLen += 1
      }
    }
    Some(out.toByteArray)
  }

  /** ASCII85Decode (ISO 32000-1 §7.4.3): 5 chars (−33) base-85 → 4
    * bytes, `z` = four zero bytes, `~>` ends, partial final group of
    * n chars yields n−1 bytes (pad with 'u'). Whitespace skipped. */
  private[sources] def ascii85Decode(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(data.length)
    val grp = new Array[Int](5)
    var n = 0
    var i = 0
    var done = false
    def flush(chars: Int): Boolean = {
      if (chars == 0) return true
      if (chars == 1) return false // a 1-char final group is corrupt
      var v = 0L
      var k = 0
      while (k < 5) { v = v * 85 + (if (k < chars) grp(k) else 84); k += 1 }
      if (v > 0xffffffffL) return false
      var b = 0
      while (b < chars - 1) { // full group emits 4, partial chars−1
        out.write(((v >> ((3 - b) * 8)) & 0xff).toInt); b += 1
      }
      true
    }
    while (i < data.length && !done) {
      val c = data(i) & 0xff
      if (c == '~') done = true
      else if (c == 'z' && n == 0) { out.write(0); out.write(0); out.write(0); out.write(0) }
      else if (isWs(c)) ()
      else if (c >= '!' && c <= 'u') {
        grp(n) = c - '!'; n += 1
        if (n == 5) { if (!flush(5)) return None; n = 0 }
      } else return None
      i += 1
    }
    if (n > 0 && !flush(n)) return None
    Some(out.toByteArray)
  }

  /** RunLengthDecode (ISO 32000-1 §7.4.5): length byte 0–127 copies
    * L+1 literals, 129–255 repeats the next byte 257−L times, 128
    * ends. */
  private[sources] def runLengthDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length)
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val l = data(i) & 0xff
      i += 1
      if (l == 128) done = true
      else if (l < 128) {
        val take = math.min(l + 1, data.length - i)
        out.write(data, i, take); i += take
      } else if (i < data.length) {
        val b = data(i); i += 1
        var k = 257 - l
        while (k > 0) { out.write(b); k -= 1 }
      }
    }
    out.toByteArray
  }

  private def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i) & 0xff
      if (c == '>') done = true
      else {
        val d = Character.digit(c, 16)
        if (d >= 0) { if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 } }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4)
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Document: xref chain, object resolution, object streams
  // ---------------------------------------------------------------

  private sealed trait XEntry
  private final case class XOffset(off: Long) extends XEntry
  private final case class XInStm(stmNum: Int, idx: Int) extends XEntry

  /** One opened document: lazily resolves indirect objects through
    * the xref map (classic and stream sections merged, newest-first),
    * memoized; hostile inputs hit the `maxObjects` fence. */
  private final class Doc(bytes: Array[Byte], maxObjects: Int) {
    private val xref = scala.collection.mutable.HashMap.empty[Int, XEntry]
    private val cache = scala.collection.mutable.HashMap.empty[Int, PObj]
    private val objStmCache =
      scala.collection.mutable.HashMap.empty[Int, Map[Int, PObj]]
    var trailer: PDict = PDict(Map.empty)
    private var resolved = 0

    def load(): Boolean = {
      val sx = findStartXref(bytes).getOrElse(return false)
      var at = sx
      var hops = 0
      val seen = scala.collection.mutable.HashSet.empty[Long]
      while (at >= 0 && at < bytes.length && hops < 64 && seen.add(at)) {
        val nxt = loadSection(at)
        at = nxt.getOrElse(-1L)
        hops += 1
      }
      trailer.get("Root").isDefined
    }

    /** Loads the xref section at `off`; returns /Prev offset. Also
      * folds in a hybrid /XRefStm section when the classic trailer
      * names one. First-seen (newest) entries win. */
    private def loadSection(off: Long): Option[Long] = {
      val lx = new Lexer(bytes, off.toInt)
      lx.skipWs()
      if (lx.expect("xref")) { // classic table
        var going = true
        while (going) {
          lx.skipWs()
          val save = lx.pos
          val t1 = lx.token()
          if (t1 == "trailer" || t1.isEmpty) { lx.pos = save; going = false }
          else {
            val start = t1.toLong
            val count = lx.token().toLong
            var i = 0L
            while (i < count) {
              lx.skipWs()
              val f1 = lx.token(); val f2 = lx.token(); val f3 = lx.token()
              val num = (start + i).toInt
              if (f3 == "n" && !xref.contains(num))
                xref(num) = XOffset(f1.toLong)
              // ("f" free entries and already-seen nums skipped)
              val _ = f2
              i += 1
            }
          }
        }
        if (lx.expect("trailer")) {
          lx.parseObject(0) match {
            case d: PDict =>
              if (trailer.m.isEmpty) trailer = d
              else trailer = PDict(d.m ++ trailer.m) // newest keys win
              d.get("XRefStm").foreach {
                case PNum(v) => loadXrefStream(v.toLong)
                case _ =>
              }
              return d.get("Prev").collect { case PNum(v) => v.toLong }
            case _ =>
          }
        }
        None
      } else loadXrefStream(off) // PDF 1.5 cross-reference stream
    }

    private def loadXrefStream(off: Long): Option[Long] = {
      if (off < 0 || off >= bytes.length) return None
      parseIndirectAt(off.toInt) match {
        case Some((_, st: PStream)) =>
          val d = st.dict
          if (trailer.m.isEmpty) trailer = d
          else trailer = PDict(d.m ++ trailer.m)
          val data = decodeStream(st, this, 1 << 24).getOrElse(return None)
          val w = d.get("W") match {
            case Some(PArr(ws)) => ws.collect { case PNum(v) => v.toInt }
            case _ => return None
          }
          if (w.isEmpty || w.sum <= 0) return None
          val size = d.get("Size").collect { case PNum(v) => v.toInt }.getOrElse(0)
          val index: Vector[(Int, Int)] = d.get("Index") match {
            case Some(PArr(is)) =>
              is.collect { case PNum(v) => v.toInt }.grouped(2).collect {
                case Vector(a, b) => (a, b)
              }.toVector
            case _ => Vector((0, size))
          }
          val rowLen = w.sum
          var p = 0
          index.foreach { case (start, count) =>
            var i = 0
            while (i < count && p + rowLen <= data.length) {
              var fi = 0
              val fields = w.map { width =>
                var v = 0L
                var k = 0
                while (k < width) { v = (v << 8) | (data(p + fi + k) & 0xff); k += 1 }
                fi += width
                v
              }
              p += rowLen
              val typ = if (w(0) == 0) 1L else fields(0)
              val num = start + i
              if (!xref.contains(num)) typ match {
                case 1 => xref(num) = XOffset(fields(1))
                case 2 => xref(num) = XInStm(fields(1).toInt, fields(2).toInt)
                case _ => // type 0 free
              }
              i += 1
            }
          }
          d.get("Prev").collect { case PNum(v) => v.toLong }
        case _ => None
      }
    }

    /** Parses `num gen obj …` at a byte offset; attaches stream bytes
      * when the body is a stream ( /Length resolved, indirect OK; a
      * wrong /Length falls back to an `endstream` scan). */
    def parseIndirectAt(off: Int): Option[(Int, PObj)] = {
      if (off < 0 || off >= bytes.length) return None
      try {
        val lx = new Lexer(bytes, off)
        lx.skipWs()
        val num = lx.token().toInt
        lx.token() // gen
        if (!lx.expect("obj")) return None
        val body = lx.parseObject(0)
        lx.skipWs()
        body match {
          case d: PDict if lx.expect("stream") =>
            // EOL after `stream`: CRLF or LF (lenient: lone CR too)
            if (lx.peek == '\r') lx.pos += 1
            if (lx.peek == '\n') lx.pos += 1
            val start = lx.pos
            val len = d.get("Length").flatMap {
              case PNum(v) => Some(v.toLong)
              case r: PRef => resolve(r) match {
                case PNum(v) => Some(v.toLong)
                case _ => None
              }
              case _ => None
            }
            val end = len match {
              case Some(l) if start + l <= bytes.length &&
                  endstreamNear(start + l.toInt) => start + l.toInt
              case _ => scanEndstream(start)
            }
            Some((num, PStream(d, java.util.Arrays.copyOfRange(bytes, start, end))))
          case other => Some((num, other))
        }
      } catch { case _: RuntimeException => None }
    }

    private def endstreamNear(at: Int): Boolean = {
      var i = at
      var ws = 0
      while (i < bytes.length && ws < 4 && isWs(bytes(i) & 0xff)) { i += 1; ws += 1 }
      i + 9 <= bytes.length &&
        new String(bytes, i, 9, "US-ASCII") == "endstream"
    }

    private def scanEndstream(start: Int): Int = {
      val pat = "endstream".getBytes("US-ASCII")
      var i = start
      while (i + pat.length <= bytes.length) {
        if (bytes(i) == 'e' && java.util.Arrays.equals(
              java.util.Arrays.copyOfRange(bytes, i, i + pat.length), pat)) {
          var e = i // trim the EOL that precedes endstream
          if (e > start && bytes(e - 1) == '\n') e -= 1
          if (e > start && bytes(e - 1) == '\r') e -= 1
          return e
        }
        i += 1
      }
      bytes.length
    }

    def resolve(o: PObj): PObj = o match {
      case r: PRef => fetch(r.num)
      case x => x
    }

    def fetch(num: Int): PObj = cache.get(num) match {
      // manual memoization: fetch re-enters itself through indirect
      // /Length and ObjStm loads, and mutable.HashMap.getOrElseUpdate
      // is not safe under re-entrant modification
      case Some(v) => v
      case None =>
        resolved += 1
        val v =
          if (resolved > maxObjects) PNull
          else xref.get(num) match {
            case Some(XOffset(off)) =>
              parseIndirectAt(off.toInt) match {
                case Some((n, obj)) if n == num => obj
                case Some((_, obj)) => obj // lenient on renumbered files
                case None => PNull
              }
            case Some(XInStm(stm, _)) =>
              // the ObjStm header pairs object NUMBERS with offsets —
              // look up by number (the index field is redundant here)
              objStm(stm).getOrElse(num, PNull)
            case None => PNull
          }
        cache(num) = v
        v
    }

    /** Loads (once) a /Type /ObjStm compressed-object stream: header
      * of /N (num, offset) pairs, bodies at /First + offset. */
    private def objStm(num: Int): Map[Int, PObj] = objStmCache.get(num) match {
      case Some(m) => m
      case None =>
        val m = fetch(num) match {
          case st: PStream =>
            (for {
              data <- decodeStream(st, this, 1 << 26)
              n <- st.dict.get("N").collect { case PNum(v) => v.toInt }
              first <- st.dict.get("First").collect { case PNum(v) => v.toInt }
            } yield {
              try {
                val lx = new Lexer(data, 0)
                val pairs = (0 until math.min(n, 1 << 16)).map { _ =>
                  (lx.token().toInt, lx.token().toInt)
                }
                pairs.map { case (onum, ooff) =>
                  val olx = new Lexer(data, first + ooff)
                  onum -> olx.parseObject(0)
                }.toMap
              } catch { case _: RuntimeException => Map.empty[Int, PObj] }
            }).getOrElse(Map.empty[Int, PObj])
          case _ => Map.empty[Int, PObj]
        }
        objStmCache(num) = m
        m
    }
  }

  /** Applies /Filter (+ /DecodeParms) to a stream's raw bytes.
    * Supported: FlateDecode (± PNG/TIFF predictors), ASCIIHexDecode,
    * and no filter; anything else → None (loud at the row level: the
    * page contributes no text, never a crash). */
  private def decodeStream(st: PStream, doc: Doc, maxOut: Int): Option[Array[Byte]] = {
    val filters: Vector[String] = doc.resolve(
      st.dict.get("Filter").getOrElse(PNull)) match {
      case PName(n) => Vector(n)
      case PArr(items) => items.map(doc.resolve).collect { case PName(n) => n }
      case _ => Vector.empty
    }
    val parms: Vector[PDict] = doc.resolve(
      st.dict.get("DecodeParms").orElse(st.dict.get("DP")).getOrElse(PNull)) match {
      case d: PDict => Vector(d)
      case PArr(items) => items.map(doc.resolve).map {
        case d: PDict => d
        case _ => PDict(Map.empty)
      }
      case _ => Vector.empty
    }
    filters.zipWithIndex.foldLeft(Option(st.raw)) { case (accOpt, (f, i)) =>
      accOpt.flatMap { acc =>
        val parm = parms.lift(i).getOrElse(PDict(Map.empty))
        def pInt(k: String, dflt: Int): Int = doc.resolve(
          parm.get(k).getOrElse(PNull)) match {
          case PNum(v) => v.toInt
          case _ => dflt
        }
        f match {
          case "FlateDecode" | "Fl" =>
            inflate(acc, maxOut).flatMap { inf =>
              unpredict(inf, pInt("Predictor", 1), pInt("Columns", 1),
                pInt("Colors", 1), pInt("BitsPerComponent", 8))
            }
          case "LZWDecode" | "LZW" =>
            lzwDecode(acc, pInt("EarlyChange", 1), maxOut).flatMap { dec =>
              unpredict(dec, pInt("Predictor", 1), pInt("Columns", 1),
                pInt("Colors", 1), pInt("BitsPerComponent", 8))
            }
          case "ASCIIHexDecode" | "AHx" => Some(asciiHexDecode(acc))
          case "ASCII85Decode" | "A85" => ascii85Decode(acc)
          case "RunLengthDecode" | "RL" => Some(runLengthDecode(acc))
          case _ => None
        }
      }
    }
  }

  private def findStartXref(bytes: Array[Byte]): Option[Long] = {
    val tailStart = math.max(0, bytes.length - 2048)
    val tail = new String(bytes, tailStart, bytes.length - tailStart, "ISO-8859-1")
    val i = tail.lastIndexOf("startxref")
    if (i < 0) return None
    val lx = new Lexer(bytes, tailStart + i + "startxref".length)
    try Some(lx.token().toLong) catch { case _: NumberFormatException => None }
  }

  // ---------------------------------------------------------------
  // Encodings
  // ---------------------------------------------------------------

  private val win1252 = java.nio.charset.Charset.forName("windows-1252")
  private lazy val macRoman: Option[java.nio.charset.Charset] =
    if (java.nio.charset.Charset.isSupported("x-MacRoman"))
      Some(java.nio.charset.Charset.forName("x-MacRoman"))
    else None

  /** StandardEncoding's printable differences from ASCII/Latin-1
    * (ISO 32000-1 Annex D.2) — quotes, ligatures, accents. Codes not
    * in the table and not plain ASCII decode to nothing. */
  private val standardHigh: Map[Int, String] = Map(
    0x27 -> "’", 0x60 -> "‘",
    0xa1 -> "¡", 0xa2 -> "¢", 0xa3 -> "£", 0xa4 -> "⁄",
    0xa5 -> "¥", 0xa6 -> "ƒ", 0xa7 -> "§", 0xa8 -> "¤",
    0xa9 -> "'", 0xaa -> "“", 0xab -> "«", 0xac -> "‹",
    0xad -> "›", 0xae -> "ﬁ", 0xaf -> "ﬂ",
    0xb1 -> "–", 0xb2 -> "†", 0xb3 -> "‡", 0xb4 -> "·",
    0xb6 -> "¶", 0xb7 -> "•", 0xb8 -> "‚", 0xb9 -> "„",
    0xba -> "”", 0xbb -> "»", 0xbc -> "…", 0xbd -> "‰",
    0xbf -> "¿", 0xc1 -> "`", 0xc2 -> "´", 0xc3 -> "ˆ",
    0xc4 -> "˜", 0xc5 -> "¯", 0xc6 -> "˘", 0xc7 -> "˙",
    0xc8 -> "¨", 0xca -> "˚", 0xcb -> "¸", 0xcd -> "˝",
    0xce -> "˛", 0xcf -> "ˇ", 0xd0 -> "—",
    0xe1 -> "Æ", 0xe3 -> "ª", 0xe8 -> "Ł", 0xe9 -> "Ø",
    0xea -> "Œ", 0xeb -> "º", 0xf1 -> "æ", 0xf5 -> "ı",
    0xf8 -> "ł", 0xf9 -> "ø", 0xfa -> "œ", 0xfb -> "ß")

  /** Glyph-name → text for /Differences arrays: the Latin letters,
    * digits, common punctuation, a Latin-1 accent set, and the
    * general `uniXXXX` escape hatch (Adobe Glyph List rules). */
  private val glyphNames: Map[String, String] = {
    val letters = ('a' to 'z').map(c => c.toString -> c.toString) ++
      ('A' to 'Z').map(c => c.toString -> c.toString)
    val digits = Map("zero" -> "0", "one" -> "1", "two" -> "2",
      "three" -> "3", "four" -> "4", "five" -> "5", "six" -> "6",
      "seven" -> "7", "eight" -> "8", "nine" -> "9")
    val punct = Map("space" -> " ", "period" -> ".", "comma" -> ",",
      "hyphen" -> "-", "underscore" -> "_", "colon" -> ":",
      "semicolon" -> ";", "exclam" -> "!", "question" -> "?",
      "quotesingle" -> "'", "quotedbl" -> "\"", "parenleft" -> "(",
      "parenright" -> ")", "slash" -> "/", "backslash" -> "\\",
      "plus" -> "+", "equal" -> "=", "asterisk" -> "*",
      "ampersand" -> "&", "at" -> "@", "numbersign" -> "#",
      "dollar" -> "$", "percent" -> "%", "bar" -> "|",
      "less" -> "<", "greater" -> ">", "bracketleft" -> "[",
      "bracketright" -> "]", "braceleft" -> "{", "braceright" -> "}")
    val accents = Map("eacute" -> "é", "egrave" -> "è",
      "agrave" -> "à", "ccedilla" -> "ç", "uumlaut" -> "ü",
      "udieresis" -> "ü", "odieresis" -> "ö",
      "adieresis" -> "ä", "ntilde" -> "ñ", "euro" -> "€",
      "bullet" -> "•", "emdash" -> "—", "endash" -> "–")
    (letters ++ digits ++ punct ++ accents).toMap
  }

  private def glyphToText(name: String): String =
    glyphNames.getOrElse(name,
      if (name.length == 7 && name.startsWith("uni")) {
        try new String(Character.toChars(Integer.parseInt(name.substring(3), 16)))
        catch { case _: RuntimeException => "" }
      } else "")

  /** String-show decoder for one font: bytes of a shown PDF string →
    * text. Two shapes: [[SimpleEncoding]] (1-byte simple fonts) and
    * [[Type0Decoder]] (2-byte composite fonts). */
  private sealed trait FontDecoder {
    def decode(bytes: Array[Byte]): String
  }

  /** Byte → text decoder for a simple font. `base` is the named base
    * encoding; `diffs` the /Differences overrides. */
  private final class SimpleEncoding(base: String, diffs: Map[Int, String])
      extends FontDecoder {
    def decode(bytes: Array[Byte]): String = {
      val sb = new StringBuilder(bytes.length)
      var i = 0
      while (i < bytes.length) {
        val c = bytes(i) & 0xff
        diffs.get(c) match {
          case Some(s) => sb.append(s)
          case None => base match {
            case "WinAnsiEncoding" =>
              sb.append(new String(Array(bytes(i)), win1252))
            case "MacRomanEncoding" =>
              macRoman match {
                case Some(cs) => sb.append(new String(Array(bytes(i)), cs))
                case None => if (c < 0x80) sb.append(c.toChar)
              }
            case "StandardEncoding" =>
              standardHigh.get(c) match {
                case Some(s) => sb.append(s)
                case None => if (c >= 0x20 && c < 0x7f) sb.append(c.toChar)
              }
            case _ => // PDFDoc-ish default: Latin-1 printable
              if (c >= 0x20) sb.append(new String(Array(bytes(i)), win1252))
              else if (c == '\n' || c == '\t') sb.append(c.toChar)
          }
        }
        i += 1
      }
      sb.toString
    }
  }

  private val defaultEncoding = new SimpleEncoding("WinAnsiEncoding", Map.empty)

  /** 2-byte-code decoder for a /Type0 composite font (ISO 32000-1
    * §9.7): each shown string is a sequence of big-endian 2-byte
    * codes — the layout of Identity-H and of every predefined 2-byte
    * CMap modern generators emit. `toUni` is the parsed /ToUnicode
    * CMap (code → text); a code the CMap misses falls back to the
    * Identity heuristic (treat the code as a BMP codepoint), which is
    * exact for the common Identity-H-with-CID=codepoint writers and
    * never throws for the rest. */
  private final class Type0Decoder(toUni: java.util.HashMap[Int, String],
                                   tally: Array[Long])
      extends FontDecoder {
    def decode(bytes: Array[Byte]): String = {
      val sb = new StringBuilder(bytes.length / 2)
      var i = 0
      while (i + 1 < bytes.length) {
        val code = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
        val mapped = toUni.get(code)
        tally(0) += 1
        if (mapped != null) sb.append(mapped)
        else {
          // Identity fallback: exact for CID==codepoint writers,
          // mojibake for real subset fonts — COUNTED so curation can
          // gate on the fraction instead of ingesting garbage
          tally(1) += 1
          if (code >= 0x20 && (code < 0xd800 || code > 0xdfff))
            sb.append(code.toChar)
        }
        i += 2
      }
      sb.toString
    }
  }

  /** Parses a /ToUnicode CMap stream (Adobe CMap syntax, the
    * bfchar/bfrange subset every generator emits) into a code → text
    * map. `beginbfchar` pairs are (srcHex, dstHex-UTF16BE);
    * `beginbfrange` triples are (loHex, hiHex, dstStartHex) — the
    * LAST UTF-16 code unit increments across the range — or (lo, hi,
    * [dst dst …]) with one explicit dst per code. Bounded: at most
    * 2^16 mappings, ranges clamped to 2^16 codes; hostile input can
    * only produce fewer mappings, never a throw that escapes. */
  private[sources] def parseToUnicodeCMap(bytes: Array[Byte]): java.util.HashMap[Int, String] = {
    val out = new java.util.HashMap[Int, String]()
    val lx = new Lexer(bytes, 0)
    val stack = scala.collection.mutable.ArrayBuffer.empty[PObj]
    def srcCode(s: PStr): Int = {
      var v = 0
      val n = math.min(s.bytes.length, 4)
      var i = 0
      while (i < n) { v = (v << 8) | (s.bytes(i) & 0xff); i += 1 }
      v
    }
    def dstText(s: PStr): String =
      new String(s.bytes, java.nio.charset.StandardCharsets.UTF_16BE)
    def put(code: Int, text: String): Unit =
      if (out.size < (1 << 16)) out.put(code, text)
    var guard = 0
    while (lx.pos < bytes.length && guard < (1 << 20)) {
      guard += 1
      lx.skipWs()
      if (lx.pos >= bytes.length) return out
      val c = lx.peek
      val isOperand = c == '(' || c == '<' || c == '[' || c == '/' ||
        c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')
      if (isOperand) {
        try stack += lx.parseObject(0)
        catch { case _: RuntimeException => return out }
      } else {
        val op = lx.token()
        if (op.isEmpty) return out
        op match {
          case "endbfchar" =>
            stack.grouped(2).foreach {
              case scala.collection.mutable.ArrayBuffer(src: PStr, dst: PStr) =>
                put(srcCode(src), dstText(dst))
              case _ =>
            }
          case "endbfrange" =>
            stack.grouped(3).foreach {
              case scala.collection.mutable.ArrayBuffer(
                  lo: PStr, hi: PStr, dst) =>
                val l = srcCode(lo)
                val h = math.min(srcCode(hi), l + (1 << 16) - 1)
                dst match {
                  case d: PStr =>
                    val base = dstText(d)
                    if (base.nonEmpty) {
                      // spec: a bfrange may not overflow its last unit —
                      // stop before wrapping past 0xFFFF or walking into
                      // the surrogate block (hostile/oversized ranges)
                      var code = l
                      var ok = true
                      while (ok && code <= h) {
                        val off = code - l
                        val unit = base.last + off
                        if (unit > 0xffff ||
                            (unit >= 0xd800 && unit <= 0xdfff)) ok = false
                        else {
                          put(code,
                            base.substring(0, base.length - 1) + unit.toChar)
                          code += 1
                        }
                      }
                    }
                  case PArr(items) =>
                    items.zipWithIndex.foreach {
                      case (d: PStr, i) if l + i <= h => put(l + i, dstText(d))
                      case _ =>
                    }
                  case _ =>
                }
              case _ =>
            }
          case _ => // begin… markers, counts, dict plumbing: drop operands
        }
        stack.clear()
      }
    }
    out
  }

  /** Builds the decoder for one font dict (resolved through `doc`).
    * /Subtype /Type0 composite fonts decode 2-byte codes through
    * their /ToUnicode CMap (Identity fallback when absent); simple
    * fonts go through [[SimpleEncoding]], whose /Encoding may be a
    * name or a dict with /BaseEncoding and /Differences
    * ([code /name /name… code /name…]). */
  private def fontDecoder(font: PObj, doc: Doc,
                          tally: Array[Long]): FontDecoder =
    doc.resolve(font) match {
      case fd: PDict if fd.get("Subtype").contains(PName("Type0")) =>
        val toUni = doc.resolve(fd.get("ToUnicode").getOrElse(PNull)) match {
          case st: PStream =>
            decodeStream(st, doc, 1 << 22).map(parseToUnicodeCMap)
              .getOrElse(new java.util.HashMap[Int, String]())
          case _ => new java.util.HashMap[Int, String]()
        }
        new Type0Decoder(toUni, tally)
      case other => fontEncoding(other, doc)
    }

  /** Builds the decoder for one SIMPLE font dict (resolved through
    * `doc`): /Encoding may be a name or a dict with /BaseEncoding and
    * /Differences ([code /name /name… code /name…]). */
  private def fontEncoding(font: PObj, doc: Doc): SimpleEncoding =
    doc.resolve(font) match {
      case fd: PDict =>
        doc.resolve(fd.get("Encoding").getOrElse(PNull)) match {
          case PName(n) => new SimpleEncoding(n, Map.empty)
          case ed: PDict =>
            val base = doc.resolve(ed.get("BaseEncoding").getOrElse(PNull)) match {
              case PName(n) => n
              case _ => "WinAnsiEncoding"
            }
            val diffs = scala.collection.mutable.HashMap.empty[Int, String]
            doc.resolve(ed.get("Differences").getOrElse(PNull)) match {
              case PArr(items) =>
                var code = 0
                items.foreach {
                  case PNum(v) => code = v.toInt
                  case PName(g) =>
                    if (code >= 0 && code < 256) diffs(code) = glyphToText(g)
                    code += 1
                  case _ =>
                }
              case _ =>
            }
            new SimpleEncoding(base, diffs.toMap)
          case _ => defaultEncoding
        }
      case _ => defaultEncoding
    }

  // ---------------------------------------------------------------
  // Content-stream text interpreter
  // ---------------------------------------------------------------

  /** Runs the text operators of one page's (concatenated) content
    * stream. Line-break policy (deterministic, documented for the
    * oracle): T*, ', and " start a new line; Td/TD with ty ≠ 0 start
    * a new line; Tm with a changed y starts a new line; BT starts a
    * new line between text objects. TJ kerning gaps < −180 (about
    * half an em at common sizes) become a single space — the common
    * extractor heuristic for inter-word gaps encoded as kerning. */
  private def runContent(content: Array[Byte], fonts: Map[String, PObj],
                         doc: Doc, out: StringBuilder, maxChars: Int,
                         tally: Array[Long]): Unit = {
    val lx = new Lexer(content, 0)
    val stack = scala.collection.mutable.ArrayBuffer.empty[PObj]
    var enc: FontDecoder = defaultEncoding
    // one decoder build per font NAME per page — a Type0 font's
    // /ToUnicode CMap parse must not repeat on every Tf switch
    val decoderCache = scala.collection.mutable.HashMap.empty[String, FontDecoder]
    var curY = Double.NaN
    var emittedInBT = false

    def num(o: PObj): Double = o match { case PNum(v) => v; case _ => 0.0 }
    def newline(): Unit = {
      if (out.nonEmpty && out.last != '\n' && out.length < maxChars) out.append('\n')
    }
    def show(s: PStr): Unit = {
      val t = enc.decode(s.bytes)
      val room = maxChars - out.length
      if (room > 0) out.append(if (t.length <= room) t else t.substring(0, room))
      emittedInBT = true
    }

    var guard = 0
    while (lx.pos < content.length && out.length < maxChars && guard < (1 << 22)) {
      guard += 1
      lx.skipWs()
      if (lx.pos >= content.length) return
      val c = lx.peek
      val isOperand = c == '(' || c == '<' || c == '[' || c == '/' ||
        c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')
      if (isOperand) {
        try stack += lx.parseObject(0)
        catch { case _: RuntimeException => return }
      } else {
        val op = lx.token()
        if (op.isEmpty) return
        op match {
          case "BT" => if (emittedInBT) newline(); emittedInBT = false; curY = Double.NaN
          case "ET" =>
          case "Tf" =>
            if (stack.length >= 2) stack(stack.length - 2) match {
              case PName(f) =>
                enc = decoderCache.getOrElseUpdate(f,
                  fonts.get(f).map(fontDecoder(_, doc, tally))
                    .getOrElse(defaultEncoding))
              case _ =>
            }
          case "Td" | "TD" =>
            if (stack.nonEmpty && emittedInBT && num(stack.last) != 0.0) newline()
            if (!curY.isNaN && stack.nonEmpty) curY -= num(stack.last)
          case "T*" => if (emittedInBT) newline()
          case "Tm" =>
            if (stack.length >= 6) {
              val y = num(stack.last)
              if (emittedInBT && !curY.isNaN && y != curY) newline()
              curY = y
            }
          case "Tj" =>
            stack.lastOption.foreach { case s: PStr => show(s); case _ => }
          case "'" =>
            if (emittedInBT) newline()
            stack.lastOption.foreach { case s: PStr => show(s); case _ => }
          case "\"" =>
            if (emittedInBT) newline()
            stack.lastOption.foreach { case s: PStr => show(s); case _ => }
          case "TJ" =>
            stack.lastOption.foreach {
              case PArr(items) =>
                items.foreach {
                  case s: PStr => show(s)
                  case PNum(v) =>
                    if (v < -180 && out.nonEmpty && out.last != ' ' &&
                        out.length < maxChars) out.append(' ')
                  case _ =>
                }
              case _ =>
            }
          case "BI" => // inline image: skip to a whitespace-delimited EI
            var i = lx.pos
            var found = false
            while (!found && i + 2 <= content.length) {
              if (content(i) == 'E' && content(i + 1) == 'I' &&
                  (i == 0 || isWs(content(i - 1) & 0xff)) &&
                  (i + 2 == content.length || isWs(content(i + 2) & 0xff))) {
                lx.pos = i + 2; found = true
              }
              i += 1
            }
            if (!found) lx.pos = content.length
          case _ => // every other operator: consume its operands
        }
        stack.clear()
      }
    }
  }

  // ---------------------------------------------------------------
  // Public extraction API
  // ---------------------------------------------------------------

  /** Extracted text + document facts for one PDF payload. */
  /** `type0Codes` / `type0Unmapped`: how many 2-byte composite-font
    * codes were decoded and how many of those fell through to the
    * Identity fallback (no /ToUnicode mapping) — the extraction-
    * confidence signal curation gates on (a high unmapped fraction
    * on a real subset font is mojibake, not text). */
  final case class PdfText(version: String, nPages: Int, text: String,
                           type0Codes: Long = 0L, type0Unmapped: Long = 0L)

  /** Sniff: does this payload start with a `%PDF-` header (allowing
    * the spec's up-to-1024-byte junk prefix, bounded to 64 here)? */
  def looksLikePdf(bytes: Array[Byte]): Boolean = {
    if (bytes == null || bytes.length < 8) return false
    val lim = math.min(bytes.length - 5, 64)
    var i = 0
    while (i <= lim) {
      if (bytes(i) == '%' && bytes(i + 1) == 'P' && bytes(i + 2) == 'D' &&
          bytes(i + 3) == 'F' && bytes(i + 4) == '-') return true
      i += 1
    }
    false
  }

  /** Full text extraction: xref chain → /Root → page tree → per-page
    * /Contents through filters → text-operator interpretation. Never
    * throws; undecodable payloads → None; per-payload work is fenced
    * by `maxPages` / `maxChars` / `maxObjects`. Page texts join with
    * a single `\n` (empty pages contribute an empty segment). */
  def extractPdfText(bytes: Array[Byte], maxPages: Int = 512,
                     maxChars: Int = 1 << 22,
                     maxObjects: Int = 1 << 17): Option[PdfText] =
    try {
      if (!looksLikePdf(bytes)) return None
      val version = {
        val h = new String(bytes, 0, math.min(bytes.length, 16), "ISO-8859-1")
        val i = h.indexOf("%PDF-")
        if (i >= 0 && i + 8 <= h.length) h.substring(i + 5, i + 8) else "?"
      }
      val doc = new Doc(bytes, maxObjects)
      if (!doc.load()) return None
      // (codes decoded, codes unmapped) across every Type0 decoder
      val tally = new Array[Long](2)
      // encrypted documents bail EXPLICITLY (strings and streams are
      // RC4/AES-enciphered; decryption keys are out of scope) — the
      // alternative is garbage text that LOOKS extracted
      if (doc.trailer.get("Encrypt").isDefined) return None
      val root = doc.resolve(doc.trailer.get("Root").getOrElse(PNull)) match {
        case d: PDict => d
        case _ => return None
      }
      val pagesRoot = doc.resolve(root.get("Pages").getOrElse(PNull)) match {
        case d: PDict => d
        case _ => return None
      }
      // page-tree walk with /Resources inheritance and cycle guard
      val pages = scala.collection.mutable.ArrayBuffer.empty[(PDict, PDict)]
      val seen = scala.collection.mutable.HashSet.empty[Int]
      def walk(node: PObj, inheritedRes: PDict, depth: Int): Unit = {
        if (depth > 64 || pages.length >= maxPages) return
        val id = node match { case PRef(n, _) => n; case _ => -1 }
        if (id >= 0 && !seen.add(id)) return
        doc.resolve(node) match {
          case d: PDict =>
            val res = doc.resolve(d.get("Resources").getOrElse(PNull)) match {
              case r: PDict => r
              case _ => inheritedRes
            }
            d.get("Type") match {
              case Some(PName("Page")) => pages += ((d, res))
              case _ => d.get("Kids") match {
                case Some(k) => doc.resolve(k) match {
                  case PArr(kids) =>
                    kids.foreach(walk(_, res, depth + 1))
                  case _ =>
                }
                case None => if (d.get("Contents").isDefined) pages += ((d, res))
              }
            }
          case _ =>
        }
      }
      walk(pagesRoot, PDict(Map.empty), 0)

      val out = new StringBuilder
      var pageIdx = 0
      pages.foreach { case (page, res) =>
        if (pageIdx > 0 && out.length < maxChars) out.append('\n')
        pageIdx += 1
        val fonts: Map[String, PObj] = doc.resolve(
          res.get("Font").getOrElse(PNull)) match {
          case fd: PDict => fd.m
          case _ => Map.empty
        }
        val contentParts: Vector[Array[Byte]] = doc.resolve(
          page.get("Contents").getOrElse(PNull)) match {
          case st: PStream => decodeStream(st, doc, maxChars * 4).toVector
          case PArr(items) => items.flatMap { it =>
            doc.resolve(it) match {
              case st: PStream => decodeStream(st, doc, maxChars * 4)
              case _ => None
            }
          }
          case _ => Vector.empty
        }
        if (contentParts.nonEmpty) {
          // spec: multiple /Contents streams form ONE content stream
          // separated by whitespace
          val joined =
            if (contentParts.length == 1) contentParts.head
            else {
              val total = contentParts.map(_.length).sum + contentParts.length - 1
              val buf = new Array[Byte](total)
              var off = 0
              contentParts.zipWithIndex.foreach { case (p, i) =>
                if (i > 0) { buf(off) = '\n'; off += 1 }
                System.arraycopy(p, 0, buf, off, p.length); off += p.length
              }
              buf
            }
          runContent(joined, fonts, doc, out, maxChars, tally)
        }
      }
      // trim the trailing newline a page-final T*/BT may have left
      while (out.nonEmpty && out.last == '\n') out.setLength(out.length - 1)
      Some(PdfText(version, pages.length, out.toString, tally(0), tally(1)))
    } catch { case _: Throwable => None }

  /** DataFrame kernel over the canonical media frame (media_id,
    * payload): one row per payload with version / page count / char
    * count / extracted text, or nulls when the payload is not a
    * parseable PDF. Map-only — payload bytes never leave their
    * partition; this is the shape that scales to a 100 TB crawl
    * (route `application/pdf` bodies here, HTML bodies to
    * [[graft.functions]]' html_to_text). */
  def describePdf(media: DataFrame, maxPages: Int = 512,
                  maxChars: Int = 1 << 22): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, p) =>
        val r = extractPdfText(p, maxPages, maxChars)
        (id, Option(p).fold(0L)(_.length.toLong), r.map(_.version),
          r.map(_.nPages), r.map(_.text.length.toLong), r.map(_.text),
          r.map(_.type0Codes), r.map(_.type0Unmapped))
      }
      .toDF("media_id", "n_bytes", "pdf_version", "n_pages", "n_chars",
        "text", "type0_codes", "type0_unmapped")
  }

  // ---------------------------------------------------------------
  // Deterministic writers (fixture + oracle synthesis)
  // ---------------------------------------------------------------

  private def escapePdfString(s: String): Array[Byte] = {
    val enc = s.getBytes(win1252) // WinAnsi code points
    val out = new java.io.ByteArrayOutputStream(enc.length + 8)
    enc.foreach { b =>
      if (b == '(' || b == ')' || b == '\\') out.write('\\')
      out.write(b)
    }
    out.toByteArray
  }

  private def contentFor(lines: Seq[String]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    w("BT\n/F1 12 Tf\n14 TL\n72 720 Td\n")
    lines.zipWithIndex.foreach { case (ln, i) =>
      if (i > 0) w("T*\n")
      w("(")
      out.write(escapePdfString(ln))
      w(") Tj\n")
    }
    w("ET\n")
    out.toByteArray
  }

  /** Writes a deterministic classic-xref PDF: one Helvetica /F1 with
    * /WinAnsiEncoding, one content stream per page (`flate` wraps it
    * in FlateDecode), lines shown with Tj + T*. Extracted text is
    * exactly `pages.map(_.mkString("\n")).mkString("\n")` — the
    * replayable formula q285's oracle uses (the q233/q242 contract).
    */
  def buildSimplePdf(pages: Seq[Seq[String]], flate: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def beginObj(): Unit = offsets += out.size
    w("%PDF-1.4\n%")
    out.write(Array(0xe2, 0xe3, 0xcf, 0xd3).map(_.toByte)) // binary marker
    w("\n")
    val nPages = pages.length
    val fontNum = 3 + 2 * nPages
    // 1: Catalog
    beginObj(); w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    // 2: Pages
    beginObj()
    w("2 0 obj\n<< /Type /Pages /Count " + nPages + " /Kids [" +
      (0 until nPages).map(i => s"${3 + 2 * i} 0 R").mkString(" ") +
      "] >>\nendobj\n")
    // per page: page dict (3+2i), content stream (4+2i)
    pages.zipWithIndex.foreach { case (lines, i) =>
      val pageNum = 3 + 2 * i
      val contNum = 4 + 2 * i
      beginObj()
      w(s"$pageNum 0 obj\n<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 $fontNum 0 R >> >> " +
        s"/Contents $contNum 0 R >>\nendobj\n")
      val body = contentFor(lines)
      val data = if (flate) {
        val d = new java.util.zip.Deflater()
        d.setInput(body); d.finish()
        val buf = new Array[Byte](body.length + 64)
        val n = d.deflate(buf); d.end()
        java.util.Arrays.copyOf(buf, n)
      } else body
      beginObj()
      w(s"$contNum 0 obj\n<< /Length ${data.length}" +
        (if (flate) " /Filter /FlateDecode" else "") + " >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }
    // font
    beginObj()
    w(s"$fontNum 0 obj\n<< /Type /Font /Subtype /Type1 " +
      "/BaseFont /Helvetica /Encoding /WinAnsiEncoding >>\nendobj\n")
    // classic xref
    val xrefAt = out.size
    val n = offsets.length + 1
    w(s"xref\n0 $n\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size $n /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** Same document, modern plumbing: the catalog/pages/page/font
    * dicts live in a /Type /ObjStm compressed object stream and the
    * cross-reference is a /Type /XRef STREAM (W [1 3 1]) compressed
    * with FlateDecode + PNG Up predictor (the layout real PDF ≥ 1.5
    * writers emit) — so q285 exercises both xref generations. Text
    * formula identical to [[buildSimplePdf]]. */
  def buildXrefStreamPdf(pages: Seq[Seq[String]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    w("%PDF-1.5\n")
    val nPages = pages.length
    // object numbering: 1 catalog, 2 pages, 3..2+n page dicts,
    // 3+n..2+2n content streams, 3+2n font, 4+2n ObjStm, 5+2n XRef
    val fontNum = 3 + 2 * nPages
    val objStmNum = fontNum + 1
    val xrefNum = objStmNum + 1

    // --- content streams (must stay outside the ObjStm) ---
    val contOffsets = scala.collection.mutable.HashMap.empty[Int, Int]
    pages.zipWithIndex.foreach { case (lines, i) =>
      val contNum = 3 + nPages + i
      val body = contentFor(lines)
      val d = new java.util.zip.Deflater()
      d.setInput(body); d.finish()
      val buf = new Array[Byte](body.length + 64)
      val m = d.deflate(buf); d.end()
      contOffsets(contNum) = out.size
      w(s"$contNum 0 obj\n<< /Length $m /Filter /FlateDecode >>\nstream\n")
      out.write(buf, 0, m)
      w("\nendstream\nendobj\n")
    }

    // --- object stream with the dicts ---
    val dictBodies: Seq[(Int, String)] =
      Seq(1 -> "<< /Type /Catalog /Pages 2 0 R >>",
        2 -> ("<< /Type /Pages /Count " + nPages + " /Kids [" +
          (0 until nPages).map(i => s"${3 + i} 0 R").mkString(" ") + "] >>")) ++
        (0 until nPages).map { i =>
          (3 + i) -> (s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
            s"/Resources << /Font << /F1 $fontNum 0 R >> >> " +
            s"/Contents ${3 + nPages + i} 0 R >>")
        } ++
        Seq(fontNum -> ("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
          "/Encoding /WinAnsiEncoding >>"))
    val bodyBuf = new java.io.ByteArrayOutputStream()
    val headBuf = new StringBuilder
    dictBodies.foreach { case (num, s) =>
      headBuf.append(num).append(' ').append(bodyBuf.size).append(' ')
      bodyBuf.write(s.getBytes("US-ASCII")); bodyBuf.write('\n')
    }
    val head = headBuf.toString.trim + "\n"
    val stmPlain = head.getBytes("US-ASCII") ++ bodyBuf.toByteArray
    val dfl = new java.util.zip.Deflater()
    dfl.setInput(stmPlain); dfl.finish()
    val cbuf = new Array[Byte](stmPlain.length + 64)
    val clen = dfl.deflate(cbuf); dfl.end()
    val objStmAt = out.size
    w(s"$objStmNum 0 obj\n<< /Type /ObjStm /N ${dictBodies.length} " +
      s"/First ${head.getBytes("US-ASCII").length} /Length $clen " +
      "/Filter /FlateDecode >>\nstream\n")
    out.write(cbuf, 0, clen)
    w("\nendstream\nendobj\n")

    // --- xref stream: W [1 3 1], PNG Up predictor, Flate ---
    val xrefAt = out.size
    val size = xrefNum + 1
    val rows = new Array[Array[Int]](size)
    rows(0) = Array(0, 0, 255) // free head
    dictBodies.zipWithIndex.foreach { case ((num, _), idx) =>
      rows(num) = Array(2, objStmNum, idx) // type-2: in ObjStm at idx
    }
    contOffsets.foreach { case (num, off) => rows(num) = Array(1, off, 0) }
    rows(objStmNum) = Array(1, objStmAt, 0)
    rows(xrefNum) = Array(1, xrefAt, 0)
    val rowLen = 1 + 3 + 1
    val table = new Array[Byte](size * (rowLen + 1)) // +1 predictor byte/row
    val prevRow = new Array[Byte](rowLen)
    for (r <- 0 until size) {
      val cur = new Array[Byte](rowLen)
      val Array(t, f2, f3) = rows(r)
      cur(0) = t.toByte
      cur(1) = ((f2 >> 16) & 0xff).toByte
      cur(2) = ((f2 >> 8) & 0xff).toByte
      cur(3) = (f2 & 0xff).toByte
      cur(4) = (f3 & 0xff).toByte
      table(r * (rowLen + 1)) = 2 // PNG Up filter
      for (i <- 0 until rowLen) {
        table(r * (rowLen + 1) + 1 + i) =
          ((cur(i) - prevRow(i)) & 0xff).toByte
        prevRow(i) = cur(i)
      }
    }
    val xd = new java.util.zip.Deflater()
    xd.setInput(table); xd.finish()
    val xbuf = new Array[Byte](table.length + 64)
    val xlen = xd.deflate(xbuf); xd.end()
    w(s"$xrefNum 0 obj\n<< /Type /XRef /Size $size /Root 1 0 R " +
      s"/W [1 3 1] /Index [0 $size] /Length $xlen /Filter /FlateDecode " +
      s"/DecodeParms << /Predictor 12 /Columns $rowLen >> >>\nstream\n")
    out.write(xbuf, 0, xlen)
    w("\nendstream\nendobj\n")
    w(s"startxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Type0/Identity-H writer (fixture + oracle synthesis)
  // ---------------------------------------------------------------

  /** CID assignment of the deterministic Type0 writer: codepoint +
    * 0x0100 — deliberately NOT the identity, so extraction is only
    * correct through the /ToUnicode CMap (the Identity fallback
    * would emit visibly shifted characters). */
  private def type0Cid(cp: Int): Int = cp + 0x0100

  private def hex4(v: Int): String = f"$v%04X"

  /** The /ToUnicode CMap for one document's character set: maximal
    * consecutive-codepoint runs become `bfrange` entries (split where
    * the CID high byte changes — ranges may not cross a 256-code
    * boundary), singleton runs become `bfchar` entries, so both CMap
    * operators are exercised by every generated document. */
  private def toUnicodeCMapFor(text: String): Array[Byte] = {
    val cps = text.toCharArray.map(_.toInt).distinct.sorted.toSeq
    val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    cps.foreach { cp =>
      runs.lastOption match {
        case Some((lo, hi)) if cp == hi + 1 &&
            (type0Cid(cp) >> 8) == (type0Cid(lo) >> 8) =>
          runs(runs.length - 1) = (lo, cp)
        case _ => runs += ((cp, cp))
      }
    }
    val (singles, ranges) = runs.partition { case (lo, hi) => lo == hi }
    val sb = new StringBuilder
    sb.append("/CIDInit /ProcSet findresource begin\n")
    sb.append("12 dict begin\nbegincmap\n")
    sb.append("/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) ")
    sb.append("/Supplement 0 >> def\n")
    sb.append("/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n")
    sb.append("1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n")
    if (singles.nonEmpty) {
      sb.append(singles.length).append(" beginbfchar\n")
      singles.foreach { case (cp, _) =>
        sb.append('<').append(hex4(type0Cid(cp))).append("> <")
          .append(hex4(cp)).append(">\n")
      }
      sb.append("endbfchar\n")
    }
    if (ranges.nonEmpty) {
      sb.append(ranges.length).append(" beginbfrange\n")
      ranges.foreach { case (lo, hi) =>
        sb.append('<').append(hex4(type0Cid(lo))).append("> <")
          .append(hex4(type0Cid(hi))).append("> <")
          .append(hex4(lo)).append(">\n")
      }
      sb.append("endbfrange\n")
    }
    sb.append("endcmap\nCMapName currentdict /CMap defineresource pop\n")
    sb.append("end\nend\n")
    sb.toString.getBytes("US-ASCII")
  }

  /** Content stream showing `lines` as 2-byte-CID hex strings — the
    * Type0 sibling of [[contentFor]]; same Tj + T* line policy, so
    * the extracted-text formula is identical. */
  private def contentForType0(lines: Seq[String]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    w("BT\n/F1 12 Tf\n14 TL\n72 720 Td\n")
    lines.zipWithIndex.foreach { case (ln, i) =>
      if (i > 0) w("T*\n")
      w("<")
      ln.foreach(ch => w(hex4(type0Cid(ch.toInt))))
      w("> Tj\n")
    }
    w("ET\n")
    out.toByteArray
  }

  /** Writes a deterministic PDF whose one font is a /Type0
    * composite — /Encoding /Identity-H, a /CIDFontType2 descendant,
    * and a /ToUnicode CMap built by [[toUnicodeCMapFor]] — the font
    * model Chrome print-to-PDF, LibreOffice, Word, and pdfTeX emit.
    * The CID scheme is shifted (codepoint + 0x100), so extracted
    * text is correct ONLY through the CMap. `xrefStream = false`
    * writes a classic xref table (PDF 1.4 layout); `true` writes the
    * PDF 1.5 layout (dicts in an ObjStm, /Type /XRef stream with
    * PNG-Up predictor). Text formula identical to
    * [[buildSimplePdf]]: `pages.map(_.mkString("\n")).mkString("\n")`. */
  /** A Type0 document with NO /ToUnicode CMap whose CIDs are raw
    * codepoints: the Identity fallback reproduces the text exactly,
    * but EVERY code counts as unmapped — the extraction-confidence
    * fixture ([[PdfText.type0Unmapped]] == [[PdfText.type0Codes]]),
    * modelling the real-world subset-font case where the fallback is
    * mojibake the gate must catch. Classic-xref layout. */
  def buildType0PdfNoToUnicode(pages: Seq[Seq[String]]): Array[Byte] = {
    val nPages = pages.length
    val fontNum = 3 + 2 * nPages
    val descNum = fontNum + 1
    val out = new java.io.ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def beginObj(): Unit = offsets += out.size
    w("%PDF-1.4\n")
    beginObj(); w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj()
    w("2 0 obj\n<< /Type /Pages /Count " + nPages + " /Kids [" +
      (0 until nPages).map(i => s"${3 + 2 * i} 0 R").mkString(" ") +
      "] >>\nendobj\n")
    pages.zipWithIndex.foreach { case (lines, i) =>
      val pageNum = 3 + 2 * i
      val contNum = 4 + 2 * i
      beginObj()
      w(s"$pageNum 0 obj\n<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 $fontNum 0 R >> >> " +
        s"/Contents $contNum 0 R >>\nendobj\n")
      // CIDs are the RAW codepoints (no shift, no CMap)
      val content = new java.io.ByteArrayOutputStream()
      def cw(s: String): Unit = content.write(s.getBytes("US-ASCII"))
      cw("BT\n/F1 12 Tf\n14 TL\n72 720 Td\n")
      lines.zipWithIndex.foreach { case (ln, k) =>
        if (k > 0) cw("T*\n")
        cw("<")
        ln.foreach(ch => cw(hex4(ch.toInt)))
        cw("> Tj\n")
      }
      cw("ET\n")
      val data = content.toByteArray
      beginObj()
      w(s"$contNum 0 obj\n<< /Length ${data.length} >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }
    beginObj()
    w(s"$fontNum 0 obj\n<< /Type /Font /Subtype /Type0 " +
      s"/BaseFont /GraftSubset /Encoding /Identity-H " +
      s"/DescendantFonts [$descNum 0 R] >>\nendobj\n")
    beginObj()
    w(s"$descNum 0 obj\n<< /Type /Font /Subtype /CIDFontType2 " +
      "/BaseFont /GraftSubset >>\nendobj\n")
    val xrefAt = out.size
    val n = offsets.length + 1
    w(s"xref\n0 $n\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size $n /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  def buildType0Pdf(pages: Seq[Seq[String]], xrefStream: Boolean): Array[Byte] = {
    val nPages = pages.length
    val fontNum = 3 + 2 * nPages
    val descNum = fontNum + 1
    val touNum = fontNum + 2
    val cmap = toUnicodeCMapFor(pages.flatten.mkString)
    val fontBody = s"<< /Type /Font /Subtype /Type0 /BaseFont /GraftSans " +
      s"/Encoding /Identity-H /DescendantFonts [$descNum 0 R] " +
      s"/ToUnicode $touNum 0 R >>"
    val descBody = "<< /Type /Font /Subtype /CIDFontType2 " +
      "/BaseFont /GraftSans /CIDSystemInfo << /Registry (Adobe) " +
      "/Ordering (Identity) /Supplement 0 >> >>"
    def deflate(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(b); d.finish()
      val buf = new Array[Byte](b.length + 64)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }

    if (!xrefStream) {
      val out = new java.io.ByteArrayOutputStream()
      val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
      def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
      def beginObj(): Unit = offsets += out.size
      w("%PDF-1.4\n%")
      out.write(Array(0xe2, 0xe3, 0xcf, 0xd3).map(_.toByte))
      w("\n")
      beginObj(); w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
      beginObj()
      w("2 0 obj\n<< /Type /Pages /Count " + nPages + " /Kids [" +
        (0 until nPages).map(i => s"${3 + 2 * i} 0 R").mkString(" ") +
        "] >>\nendobj\n")
      pages.zipWithIndex.foreach { case (lines, i) =>
        val pageNum = 3 + 2 * i
        val contNum = 4 + 2 * i
        beginObj()
        w(s"$pageNum 0 obj\n<< /Type /Page /Parent 2 0 R " +
          s"/MediaBox [0 0 612 792] " +
          s"/Resources << /Font << /F1 $fontNum 0 R >> >> " +
          s"/Contents $contNum 0 R >>\nendobj\n")
        val data = deflate(contentForType0(lines))
        beginObj()
        w(s"$contNum 0 obj\n<< /Length ${data.length} " +
          "/Filter /FlateDecode >>\nstream\n")
        out.write(data)
        w("\nendstream\nendobj\n")
      }
      beginObj(); w(s"$fontNum 0 obj\n$fontBody\nendobj\n")
      beginObj(); w(s"$descNum 0 obj\n$descBody\nendobj\n")
      beginObj()
      w(s"$touNum 0 obj\n<< /Length ${cmap.length} >>\nstream\n")
      out.write(cmap)
      w("\nendstream\nendobj\n")
      val xrefAt = out.size
      val n = offsets.length + 1
      w(s"xref\n0 $n\n0000000000 65535 f \n")
      offsets.foreach(o => w(f"$o%010d 00000 n \n"))
      w(s"trailer\n<< /Size $n /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
      out.toByteArray
    } else {
      val out = new java.io.ByteArrayOutputStream()
      def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
      w("%PDF-1.5\n")
      // numbering: 1 catalog, 2 pages, 3..2+n page dicts, 3+n..2+2n
      // content streams, then font/descendant/ToUnicode/ObjStm/XRef
      val fNum = 3 + 2 * nPages
      val dNum = fNum + 1
      val tNum = fNum + 2
      val objStmNum = fNum + 3
      val xrefNum = fNum + 4
      val streamOffsets = scala.collection.mutable.HashMap.empty[Int, Int]
      pages.zipWithIndex.foreach { case (lines, i) =>
        val contNum = 3 + nPages + i
        val data = deflate(contentForType0(lines))
        streamOffsets(contNum) = out.size
        w(s"$contNum 0 obj\n<< /Length ${data.length} " +
          "/Filter /FlateDecode >>\nstream\n")
        out.write(data)
        w("\nendstream\nendobj\n")
      }
      streamOffsets(tNum) = out.size
      w(s"$tNum 0 obj\n<< /Length ${cmap.length} >>\nstream\n")
      out.write(cmap)
      w("\nendstream\nendobj\n")
      val fontBodyX = s"<< /Type /Font /Subtype /Type0 /BaseFont /GraftSans " +
        s"/Encoding /Identity-H /DescendantFonts [$dNum 0 R] " +
        s"/ToUnicode $tNum 0 R >>"
      val dictBodies: Seq[(Int, String)] =
        Seq(1 -> "<< /Type /Catalog /Pages 2 0 R >>",
          2 -> ("<< /Type /Pages /Count " + nPages + " /Kids [" +
            (0 until nPages).map(i => s"${3 + i} 0 R").mkString(" ") + "] >>")) ++
          (0 until nPages).map { i =>
            (3 + i) -> (s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
              s"/Resources << /Font << /F1 $fNum 0 R >> >> " +
              s"/Contents ${3 + nPages + i} 0 R >>")
          } ++
          Seq(fNum -> fontBodyX, dNum -> descBody)
      val bodyBuf = new java.io.ByteArrayOutputStream()
      val headBuf = new StringBuilder
      dictBodies.foreach { case (num, s) =>
        headBuf.append(num).append(' ').append(bodyBuf.size).append(' ')
        bodyBuf.write(s.getBytes("US-ASCII")); bodyBuf.write('\n')
      }
      val head = headBuf.toString.trim + "\n"
      val stmPlain = head.getBytes("US-ASCII") ++ bodyBuf.toByteArray
      val comp = deflate(stmPlain)
      val objStmAt = out.size
      w(s"$objStmNum 0 obj\n<< /Type /ObjStm /N ${dictBodies.length} " +
        s"/First ${head.getBytes("US-ASCII").length} /Length ${comp.length} " +
        "/Filter /FlateDecode >>\nstream\n")
      out.write(comp)
      w("\nendstream\nendobj\n")
      val xrefAt = out.size
      val size = xrefNum + 1
      val rows = new Array[Array[Int]](size)
      rows(0) = Array(0, 0, 255)
      dictBodies.zipWithIndex.foreach { case ((num, _), idx) =>
        rows(num) = Array(2, objStmNum, idx)
      }
      streamOffsets.foreach { case (num, off) => rows(num) = Array(1, off, 0) }
      rows(objStmNum) = Array(1, objStmAt, 0)
      rows(xrefNum) = Array(1, xrefAt, 0)
      val rowLen = 1 + 3 + 1
      val table = new Array[Byte](size * (rowLen + 1))
      val prevRow = new Array[Byte](rowLen)
      for (r <- 0 until size) {
        val cur = new Array[Byte](rowLen)
        val Array(t, f2, f3) = rows(r)
        cur(0) = t.toByte
        cur(1) = ((f2 >> 16) & 0xff).toByte
        cur(2) = ((f2 >> 8) & 0xff).toByte
        cur(3) = (f2 & 0xff).toByte
        cur(4) = (f3 & 0xff).toByte
        table(r * (rowLen + 1)) = 2
        for (i <- 0 until rowLen) {
          table(r * (rowLen + 1) + 1 + i) =
            ((cur(i) - prevRow(i)) & 0xff).toByte
          prevRow(i) = cur(i)
        }
      }
      val xcomp = deflate(table)
      w(s"$xrefNum 0 obj\n<< /Type /XRef /Size $size /Root 1 0 R " +
        s"/W [1 3 1] /Index [0 $size] /Length ${xcomp.length} " +
        "/Filter /FlateDecode " +
        s"/DecodeParms << /Predictor 12 /Columns $rowLen >> >>\nstream\n")
      out.write(xcomp)
      w("\nendstream\nendobj\n")
      w(s"startxref\n$xrefAt\n%%EOF\n")
      out.toByteArray
    }
  }
}
