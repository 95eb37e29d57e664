package graft.sources

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) — the web-crawl container an LLM corpus actually
  * starts from (Common Crawl ships WARC): records of
  * `WARC/1.x` + header block + Content-Length payload, where
  * `response` records carry an HTTP message whose body is the page.
  * This closes the crawl-to-training-text path end to end:
  * WARC bytes → response records → HTML body → [[graft.functions
  * .HtmlToText]] → text the quality/dedup stages consume.
  *
  * Scope:
  * - Plain WARC and gzip-compressed WARC (Common Crawl's
  *   member-per-record form included — multi-member gzip streams
  *   inflate across member boundaries), total inflated size fenced.
  * - Record walk: version line, headers to the blank line,
  *   `Content-Length` payload, the spec's record-separating CRLF
  *   pair (tolerated missing at EOF or under truncation — entries
  *   before the cut are kept).
  * - `response` records: the HTTP status line and headers parse out
  *   of the payload (status code, Content-Type), the body follows
  *   the HTTP blank line.
  *
  * Hostile posture as everywhere: fences on record count and body
  * bytes, bounds-checked walks, never a throw.
  *
  * Reference anchor: the reference ships no WARC reader; this
  * extends SURVEY §2's source tier (format per ISO 28500 / the IIPC
  * WARC 1.1 specification). */
object Warc {

  final case class WarcRecord(recordIdx: Int, warcType: String,
                              targetUri: String, contentLength: Long,
                              httpStatus: Option[Int],
                              contentType: Option[String],
                              body: Array[Byte],
                              bodyTruncated: Boolean = false,
                              xRobotsTag: Option[String] = None,
                              refersTo: Option[String] = None,
                              payloadDigest: Option[String] = None,
                              encoding: String = "identity",
                              location: Option[String] = None,
                              refresh: Option[String] = None)

  /** One container's full parse result: the records that decoded plus
    * WHY the walk stopped — fences must be loud (r11 verdict: an
    * over-fence gzip silently contributed zero rows). `endReason`:
    * - `ok`            — clean walk to end of data
    * - `record_cap`    — stopped at `maxRecords` (more data remained)
    * - `truncated`     — a Content-Length ran past the container end
    * - `corrupt`       — header block never closed / no forward progress
    * - `not_warc`      — data present but no WARC/ magic
    * - `inflate_over_fence` — gzip inflates past the cell fence; the
    *   container is NOT parseable in cell form and belongs on the
    *   [[describeWarcPaths]] streaming path
    * - `empty`         — fewer than 9 bytes of input */
  final case class WarcParse(records: Seq[WarcRecord], endReason: String) {
    def truncatedBodies: Int = records.count(_.bodyTruncated)
    /** Bodies whose HTTP wire decode failed (label carries a `!`) —
      * raw bytes were kept, the row is still present, the counter is
      * the loudness channel. */
    def undecodableBodies: Int =
      records.count(r => r.encoding != null && r.encoding.indexOf('!') >= 0)
  }

  /** Inflate a (possibly multi-member) gzip stream, fenced. Returns
    * null when not gzip or on corrupt data, [[OverFence]] when the
    * stream inflates past maxOut. */
  private def gunzipAll(bytes: Array[Byte], maxOut: Int): Array[Byte] = {
    if (bytes.length < 2 || (bytes(0) & 0xff) != 0x1f ||
        (bytes(1) & 0xff) != 0x8b) return null
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream(math.min(bytes.length * 4, maxOut))
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n > 0 && out.size <= maxOut) {
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      if (out.size > maxOut) OverFence else out.toByteArray
    } catch { case _: java.io.IOException => null }
  }

  // ==== HTTP payload decoding (wire bytes → entity bytes) ===========
  //
  // Heritrix-/browser-produced WARCs store the HTTP message AS SENT
  // ON THE WIRE: a response body may carry `Transfer-Encoding:
  // chunked` framing (hex size lines interleaved with the data) and
  // sit under `Content-Encoding: gzip/deflate/zstd`. Handing those
  // raw bytes to the carriers turns a gzip'd HTML page into binary
  // mojibake and leaks `1ff8\r\n` chunk framing into training text
  // (r16 verdict item 1). The wire order is charset-independent:
  // the server applies Content-Encoding first and Transfer-Encoding
  // last, so decoding runs chunked-first, then content codings in
  // reverse header order. Every step is bounded by the body fence
  // and never throws; a step that cannot decode keeps the bytes it
  // had and marks the applied-steps label with `!failed` /
  // `!over_fence` / `!undecoded` — the loudness channel the
  // `bodies_undecodable` fence counter aggregates.

  /** Identity-compared sentinel distinguishing OVER-FENCE from
    * corrupt-stream in the decoder returns (ADVICE r17: an entity
    * that decompressed past maxBody surfaced as `gzip!failed`,
    * indistinguishable from corrupt data — the documented
    * `!over_fence` label had no emitter). Decoders return: the bytes
    * on success, `null` on corrupt data, `OverFence` when the ONLY
    * failure was the size fence. */
  private[sources] val OverFence: Array[Byte] = new Array[Byte](0)

  /** De-chunk a `Transfer-Encoding: chunked` HTTP body: hex size
    * line (`;ext` tolerated) + CRLF + data + CRLF, repeated, ended by
    * the 0-chunk (trailers skipped). Returns null on malformed
    * framing, [[OverFence]] when the reassembled body exceeds
    * maxOut. */
  private[sources] def dechunk(bytes: Array[Byte], maxOut: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.min(bytes.length, 1 << 16))
    var p = 0
    while (true) {
      // hex chunk-size line (chunk extensions after ';' ignored)
      var q = p
      var size = 0L
      var digits = 0
      while (q < bytes.length && hexDigit(bytes(q)) >= 0 && digits <= 8) {
        size = size * 16 + hexDigit(bytes(q)); q += 1; digits += 1
      }
      if (digits == 0 || digits > 8) return null
      while (q < bytes.length && bytes(q) != '\r' && bytes(q) != '\n') q += 1 // ;ext
      if (q + 1 < bytes.length && bytes(q) == '\r' && bytes(q + 1) == '\n') q += 2
      else if (q < bytes.length && bytes(q) == '\n') q += 1
      else return null
      if (size == 0)
        return if (out.size > maxOut) OverFence else out.toByteArray
      if (q + size > bytes.length) return null // truncated = corrupt
      if (out.size + size > maxOut) return OverFence
      out.write(bytes, q, size.toInt)
      p = (q + size).toInt
      // the CRLF closing the chunk data
      if (p + 1 < bytes.length && bytes(p) == '\r' && bytes(p + 1) == '\n') p += 2
      else if (p < bytes.length && bytes(p) == '\n') p += 1
      else return null
    }
    null // unreachable
  }

  private def hexDigit(b: Byte): Int = {
    val c = b & 0xff
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1
  }

  /** Inflate a zlib- OR raw-deflate body (servers send both under
    * `Content-Encoding: deflate` — RFC 9110 §8.4.1.1 notes the
    * widespread raw-deflate deviation), fenced. Null on failure,
    * [[OverFence]] when the stream inflates past maxOut. */
  private def inflateDeflate(bytes: Array[Byte], maxOut: Int): Array[Byte] = {
    def run(nowrap: Boolean): Array[Byte] =
      try {
        val inf = new java.util.zip.Inflater(nowrap)
        inf.setInput(bytes)
        val out = new java.io.ByteArrayOutputStream(math.min(bytes.length * 4, maxOut))
        val buf = new Array[Byte](1 << 16)
        while (!inf.finished() && out.size <= maxOut) {
          val n = inf.inflate(buf)
          if (n == 0 && !inf.finished()) { inf.end(); return null } // needs input/dict
          out.write(buf, 0, n)
        }
        inf.end()
        if (out.size > maxOut) OverFence
        else if (out.size == 0) null
        else out.toByteArray
      } catch { case _: Exception => null }
    val zlib = run(nowrap = false)
    if (zlib != null) zlib else run(nowrap = true)
  }

  /** Bounded zstd decode (zstd-jni, already on Spark's classpath —
    * the Archives door's codec). Null on failure, [[OverFence]] past
    * the fence. */
  private def unzstd(bytes: Array[Byte], maxOut: Int): Array[Byte] =
    try {
      val in = new com.github.luben.zstd.ZstdInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream(math.min(bytes.length * 4, maxOut))
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n > 0 && out.size <= maxOut) { out.write(buf, 0, n); n = in.read(buf) }
      if (out.size > maxOut) OverFence else out.toByteArray
    } catch { case _: Throwable => null }

  /** Decode one HTTP body from its wire form: de-chunk first when
    * `Transfer-Encoding` says chunked, then undo `Content-Encoding`
    * codings in reverse header order (gzip/x-gzip, deflate, zstd,
    * and — since r18, via the pure-JVM RFC 7932 [[Brotli]] decoder —
    * br, the second-most-common coding on the modern web;
    * identity/none skipped; unknown tokens stop with an `!undecoded`
    * label and the bytes as far as decoding got). Returns (bytes,
    * applied-steps label); the label is `identity` when nothing
    * applied and carries a `!` marker on any failure — never throws,
    * never unbounded. */
  private[sources] def decodeHttpPayload(body: Array[Byte],
                                         transferEncoding: Option[String],
                                         contentEncoding: Option[String],
                                         maxOut: Int): (Array[Byte], String) = {
    var cur = body
    val steps = Seq.newBuilder[String]
    var failed = false
    // One decode step: success advances `cur`; corrupt data keeps the
    // wire bytes under `!failed` (diagnosable, and a sniffing carrier
    // may still salvage); OVER-FENCE blanks the body under
    // `!over_fence` — the step positively established the content is
    // compressed beyond the fence, so forwarding compressed bytes to
    // the carriers could only produce mojibake (ADVICE r17).
    def step(name: String, d: Array[Byte]): Unit =
      if (d eq OverFence) {
        steps += s"$name!over_fence"; cur = Array.emptyByteArray; failed = true
      }
      else if (d == null) { steps += s"$name!failed"; failed = true }
      else { steps += name; cur = d }
    val chunked = transferEncoding.exists(
      _.toLowerCase(java.util.Locale.ROOT).contains("chunked"))
    if (chunked) step("chunked", dechunk(cur, maxOut))
    if (!failed) {
      val codings = contentEncoding.toSeq
        .flatMap(_.toLowerCase(java.util.Locale.ROOT).split(","))
        .map(_.trim).filter(c => c.nonEmpty && c != "identity" && c != "none")
        .reverse // applied first = listed first, so undo in reverse
      val it = codings.iterator
      while (it.hasNext && !failed) {
        it.next() match {
          case "gzip" | "x-gzip" => step("gzip", gunzipAll(cur, maxOut))
          case "deflate" => step("deflate", inflateDeflate(cur, maxOut))
          case "zstd" => step("zstd", unzstd(cur, maxOut))
          case "br" => // pure-JVM RFC 7932 decoder (r18)
            step("br", {
              val d = Brotli.decode(cur, maxOut)
              if (d eq Brotli.OverFence) OverFence else d
            })
          case other =>
            steps += s"$other!undecoded"; failed = true
        }
      }
    }
    val parts = steps.result()
    (cur, if (parts.isEmpty) "identity" else parts.mkString("+"))
  }

  /** Parse WARC records (auto-gunzips). None = not a WARC at all;
    * truncation keeps the records before the cut. Thin compatibility
    * wrapper over [[parseWarcOutcome]], which additionally names WHY
    * a walk ended — callers that can surface counters should prefer
    * it (this wrapper is where fence drops used to go silent). */
  def parseWarcRecords(bytes: Array[Byte], maxRecords: Int = 1 << 12,
                       maxBody: Int = 1 << 24): Option[Seq[WarcRecord]] = {
    val p = parseWarcOutcome(bytes, maxRecords, maxBody)
    if (p.records.nonEmpty) Some(p.records) else None
  }

  /** The cell-form walk with a loud outcome (see [[WarcParse]]). */
  def parseWarcOutcome(bytes: Array[Byte], maxRecords: Int = 1 << 12,
                       maxBody: Int = 1 << 24): WarcParse = {
    if (bytes == null || bytes.length < 9) return WarcParse(Nil, "empty")
    val gzipped = bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
      (bytes(1) & 0xff) == 0x8b
    val data = {
      val g = gunzipAll(bytes, 1 << 26)
      if (g == null || (g eq OverFence)) bytes else g
    }
    // a gzip container that would not inflate within the cell fence is
    // a DISTINCT loud outcome: the data may be a perfectly good WARC
    // that simply cannot enter in cell form (route it to the
    // streaming path), not "not a WARC"
    if (gzipped && (data eq bytes))
      return WarcParse(Nil, "inflate_over_fence")
    if (data.length < 9 || !startsWith(data, 0, "WARC/"))
      return WarcParse(Nil, "not_warc")
    val out = Seq.newBuilder[WarcRecord]
    var p = 0
    var k = 0
    while (p + 9 <= data.length && startsWith(data, p, "WARC/")) {
      if (k >= maxRecords) return WarcParse(out.result(), "record_cap")
      // ---- WARC header block ----------------------------------------
      val headerEnd = findBlank(data, p)
      if (headerEnd < 0) return WarcParse(out.result(), "corrupt")
      val headers = parseHeaders(data, nextLine(data, p), headerEnd)
      val wType = headers.getOrElse("warc-type", "")
      val uri = headers.getOrElse("warc-target-uri", null)
      val clen =
        try headers.getOrElse("content-length", "-1").trim.toLong
        catch { case _: NumberFormatException => -1L }
      if (clen < 0) return WarcParse(out.result(), "corrupt")
      val bodyStart = headerEnd
      val bodyEnd = bodyStart + math.min(clen, data.length.toLong - bodyStart)
      // ---- response records: HTTP status + headers + body -----------
      var status: Option[Int] = None
      var ctype: Option[String] = None
      var xRobots: Option[String] = None
      var location: Option[String] = None
      var refreshH: Option[String] = None
      var body: Array[Byte] = Array.emptyByteArray
      var bodyCut = false
      var enc = "identity"
      if (wType.equalsIgnoreCase("response") &&
          startsWith(data, bodyStart, "HTTP/")) {
        val httpHeaderEnd = findBlank(data, bodyStart)
        if (httpHeaderEnd > 0 && httpHeaderEnd <= bodyEnd) {
          val statusLine = lineAt(data, bodyStart)
          val parts = statusLine.split(" ", 3)
          if (parts.length >= 2 && parts(1).forall(_.isDigit) &&
              parts(1).nonEmpty && parts(1).length <= 3)
            status = Some(parts(1).toInt)
          val hh = parseHeaders(data, nextLine(data, bodyStart), httpHeaderEnd)
          ctype = hh.get("content-type")
          xRobots = hh.get("x-robots-tag")
          location = hh.get("location")
          refreshH = hh.get("refresh")
          val bl = (bodyEnd - httpHeaderEnd).toInt
          if (bl > 0 && bl <= maxBody) {
            body = java.util.Arrays.copyOfRange(data, httpHeaderEnd, bodyEnd.toInt)
            // wire form → entity form: de-chunk + Content-Encoding
            // decode BEFORE any carrier sees the bytes (r16 item 1)
            val (decoded, label) = decodeHttpPayload(body,
              hh.get("transfer-encoding"), hh.get("content-encoding"), maxBody)
            body = decoded
            enc = label
          }
          // maxBody == 0 is the deliberate listing projection, not a
          // fence: only a POSITIVE cap that cut a body counts as loud
          else if (bl > 0 && maxBody > 0) bodyCut = true
        }
      }
      out += WarcRecord(k, wType, uri, clen, status, ctype, body, bodyCut,
        xRobots, headers.get("warc-refers-to-target-uri"),
        headers.get("warc-payload-digest"), enc, location, refreshH)
      k += 1
      // payload + the record-separating CRLFCRLF (tolerant at EOF).
      // q is Long: a hostile multi-GB Content-Length must clamp here,
      // not wrap negative through toInt (the never-throw contract).
      var q = bodyStart.toLong + clen
      if (q > data.length)
        return WarcParse(out.result(), "truncated") // truncated/lying length
      var sep = 0
      while (sep < 4 && q < data.length &&
          (data(q.toInt) == '\r' || data(q.toInt) == '\n')) { q += 1; sep += 1 }
      if (q <= p) return WarcParse(out.result(), "corrupt") // no forward progress
      p = q.toInt
    }
    WarcParse(out.result(), if (p + 9 <= data.length) "corrupt" else "ok")
  }

  private def startsWith(d: Array[Byte], at: Int, s: String): Boolean = {
    if (at + s.length > d.length) return false
    var i = 0
    while (i < s.length) {
      if ((d(at + i) & 0xff) != s.charAt(i)) return false
      i += 1
    }
    true
  }

  /** Index just past the header block's blank line (\r\n\r\n or \n\n),
    * or -1. */
  private def findBlank(d: Array[Byte], from: Int): Int = {
    var i = from
    while (i < d.length) {
      if (d(i) == '\n') {
        if (i + 1 < d.length && d(i + 1) == '\n') return i + 2
        if (i + 2 < d.length && d(i + 1) == '\r' && d(i + 2) == '\n') return i + 3
      }
      i += 1
    }
    -1
  }

  private def nextLine(d: Array[Byte], from: Int): Int = {
    var i = from
    while (i < d.length && d(i) != '\n') i += 1
    math.min(i + 1, d.length)
  }

  private def lineAt(d: Array[Byte], at: Int): String = {
    var end = at
    while (end < d.length && d(end) != '\n' && d(end) != '\r') end += 1
    new String(d, at, end - at, java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** `Name: value` headers between from and end (exclusive), keys
    * lower-cased; malformed lines skipped. */
  private def parseHeaders(d: Array[Byte], from: Int, end: Int): Map[String, String] = {
    val m = Map.newBuilder[String, String]
    var i = from
    while (i < end) {
      val line = lineAt(d, i)
      val c = line.indexOf(':')
      if (c > 0)
        m += (line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT) ->
          line.substring(c + 1).trim)
      i = nextLine(d, i)
    }
    m.result()
  }

  // ==== charset-aware HTML decode ====================================

  /** The charset a response body should decode with: the `charset=`
    * parameter of the HTTP Content-Type when present, else a bounded
    * `<meta charset=…>` / `<meta http-equiv … content="…charset=…">`
    * sniff over the first 1 KiB (HTML5 prescan discipline — the meta
    * must be ASCII-visible early to count), else the UTF-8 default.
    * Legacy-charset pages are a large fraction of real crawls
    * (ISO-8859-1, windows-125x, GBK, Shift_JIS); decoding them as
    * UTF-8 silently mojibakes the training text. Returns the
    * lower-case canonical-input name; unknown/unsupported names fall
    * back to utf-8 so the decode can never throw.
    *
    * UNDECLARED pages (r17): a body with no charset anywhere that
    * fails UTF-8 validation falls back to windows-1252 — the
    * browsers' own legacy default (WHATWG encoding standard) and the
    * superset-of-latin1 that covers the dominant undeclared-legacy
    * fraction of a real crawl; a valid-UTF-8 body keeps the UTF-8
    * default. Validation is a bounded structural scan, never a
    * throw.
    *
    * UNDECLARED CJK (r18): before the cp1252 fallback, [[sniffCjk]]
    * runs a bounded byte-distribution detection for Shift_JIS /
    * EUC-JP / EUC-KR / GBK — the East-Asian crawl fraction where
    * declarations are also often absent decoded as cp1252 mojibake
    * under the r17 rule. The sniff is conservative (≥8 high bytes,
    * ≥4 violation-free pairs, structure-distinctive evidence), so
    * accented-Latin cp1252 pages keep falling to cp1252.
    *
    * UNDECLARED UTF-16 / Cyrillic (r19): [[sniffUtf16]] runs FIRST
    * (BOM or alternating-NUL structure — ASCII-heavy UTF-16 is
    * byte-wise valid UTF-8, so it must be caught before the UTF-8
    * tier), and [[sniffCyrillic]] (KOI8-R vs windows-1251 case
    * banding) runs after the CJK sniff, ahead of the cp1252
    * fallback. */
  private[sources] def htmlCharset(contentType: Option[String],
                                   body: Array[Byte]): String = {
    def fromParams(s: String): Option[String] = {
      val low = s.toLowerCase(java.util.Locale.ROOT)
      val at = low.indexOf("charset=")
      if (at < 0) None
      else {
        val v = low.substring(at + 8).takeWhile(c => c != ';' && c != ' ')
          .dropWhile(c => c == '"' || c == '\'')
          .takeWhile(c => c != '"' && c != '\'')
        if (v.isEmpty) None else Some(v)
      }
    }
    val declared = contentType.flatMap(fromParams).orElse {
      // bounded meta prescan: ASCII window, quote-tolerant
      val n = math.min(body.length, 1024)
      val head = new String(body, 0, n, java.nio.charset.StandardCharsets.ISO_8859_1)
        .toLowerCase(java.util.Locale.ROOT)
      val mc = "<meta\\s+charset\\s*=\\s*[\"']?([a-z0-9_\\-]+)".r
      mc.findFirstMatchIn(head).map(_.group(1)).orElse(fromParams(head))
    }
    declared.filter(c => try java.nio.charset.Charset.isSupported(c)
      catch { case _: Exception => false })
      .getOrElse {
        // UTF-16 FIRST: ASCII-heavy UTF-16 is byte-wise VALID UTF-8
        // (every unit is an ASCII byte + NUL), so the looksUtf8 tier
        // would admit it and the decode would thread NULs through
        // the text (r18 verdict missing item 2's sibling)
        val u16 = sniffUtf16(body)
        if (u16 != null) u16
        else if (looksUtf8(body)) "utf-8"
        else {
          val cjk = sniffCjk(body)
          if (cjk != null) cjk
          else {
            val cyr = sniffCyrillic(body)
            if (cyr != null) cyr else "windows-1252"
          }
        }
      }
  }

  /** Bounded UTF-16 detection for UNDECLARED bodies (r18 verdict
    * missing item 2 — old CMS exports ship UTF-16 with no BOM and no
    * declaration): a BOM decides immediately ("utf-16" lets the JVM
    * decoder consume it); otherwise the ALTERNATING-NUL structure of
    * ASCII-heavy UTF-16 text decides — HTML markup is ASCII, so one
    * byte parity is dominated by NUL high bytes (≥40% of units)
    * while genuine single-byte text contains essentially no NULs at
    * all (the other parity must carry ≤2%). Returns the charset name
    * or null. Pure bounded scan, never throws. */
  private[sources] def sniffUtf16(b: Array[Byte], limit: Int = 4096): String = {
    val n0 = math.min(b.length, limit)
    if (n0 >= 2) {
      val b0 = b(0) & 0xff; val b1 = b(1) & 0xff
      // the "utf-16" decoder honors and STRIPS the BOM; a pinned
      // LE/BE name would decode it as a stray U+FEFF
      if (b0 == 0xff && b1 == 0xfe) return "utf-16"
      if (b0 == 0xfe && b1 == 0xff) return "utf-16"
    }
    val n = n0 & ~1
    val units = n / 2
    if (units < 16) return null
    var zeroEven = 0; var zeroOdd = 0
    var i = 0
    while (i < n) {
      if (b(i) == 0) { if ((i & 1) == 0) zeroEven += 1 else zeroOdd += 1 }
      i += 1
    }
    if (zeroOdd * 10 >= units * 4 && zeroEven * 100 <= units * 2) "utf-16le"
    else if (zeroEven * 10 >= units * 4 && zeroOdd * 100 <= units * 2) "utf-16be"
    else null
  }

  /** Bounded byte-distribution sniff for the two dominant Cyrillic
    * legacy encodings over an UNDECLARED non-UTF-8 non-CJK body
    * (r18 verdict missing item 2: the large pre-2010 ru/bg web
    * fraction — where declarations are also often absent — decoded
    * as cp1252 mojibake under the r17 fallback). Case banding
    * decides: KOI8-R puts LOWERCASE а-я at 0xC0–0xDF and uppercase
    * at 0xE0–0xFF; windows-1251 is the opposite (uppercase А-Я at
    * 0xC0–0xDF, lowercase at 0xE0–0xFF) — and prose is
    * lowercase-dominant, so ≥60% of letter bytes in one band names
    * the encoding.
    *
    * Conservative floors (the sniffCjk discipline — an accented-
    * Latin cp1252 page must NEVER sniff Cyrillic): ≥30 high bytes,
    * ≥5 runs of ≥3 CONSECUTIVE high bytes (Cyrillic words are
    * unbroken high-byte runs; Latin accents are isolated), and ≥80%
    * of high bytes inside the two letter bands (cp1252 prose mixes
    * punctuation ranges). Returns the charset name or null. */
  private[sources] def sniffCyrillic(b: Array[Byte], limit: Int = 4096): String = {
    val n = math.min(b.length, limit)
    var hi = 0
    var runs3 = 0
    var run = 0
    var band0 = 0 // 0xC0–0xDF: KOI8-R lowercase | cp1251 uppercase
    var band1 = 0 // 0xE0–0xFF: cp1251 lowercase | KOI8-R uppercase
    var i = 0
    while (i < n) {
      val c = b(i) & 0xff
      if (c >= 0x80) {
        hi += 1; run += 1
        if (run == 3) runs3 += 1
        if (c >= 0xc0 && c <= 0xdf) band0 += 1
        else if (c >= 0xe0) band1 += 1
      } else run = 0
      i += 1
    }
    if (hi < 30 || runs3 < 5) return null
    val letters = band0 + band1
    if (letters * 10 < hi * 8) return null
    if (band0 * 10 >= letters * 6) "koi8-r"
    else if (band1 * 10 >= letters * 6) "windows-1251"
    else null
  }

  /** Bounded UTF-8 structural validation over the first `limit`
    * bytes: continuation counts, no bare continuations, no 0xC0/C1 or
    * >0xF4 lead bytes; a multi-byte sequence cut by the limit (or the
    * body end) is tolerated. Pure scan, never throws. */
  private[sources] def looksUtf8(b: Array[Byte], limit: Int = 4096): Boolean = {
    val n = math.min(b.length, limit)
    var i = 0
    while (i < n) {
      val c = b(i) & 0xff
      val need =
        if (c < 0x80) 0
        else if (c >= 0xc2 && c <= 0xdf) 1
        else if (c >= 0xe0 && c <= 0xef) 2
        else if (c >= 0xf0 && c <= 0xf4) 3
        else return false // bare continuation or invalid lead
      var k = 1
      while (k <= need) {
        // a sequence cut by the SCAN LIMIT is fine (more bytes exist);
        // one cut at the true end of the body is invalid UTF-8
        if (i + k >= n) return n < b.length
        if ((b(i + k) & 0xc0) != 0x80) return false
        k += 1
      }
      i += need + 1
    }
    true
  }

  /** Bounded byte-distribution sniff for the five major East-Asian
    * legacy encodings over an UNDECLARED non-UTF-8 body (r17 verdict
    * missing item 3 / r18: the cp1252 fallback mojibakes the CJK
    * crawl fraction, where meta declarations are also often absent).
    * Chardet-class, but deterministic and documented: one structural
    * walk per candidate over the first `limit` bytes, then a fixed
    * decision tree on structure-distinctive evidence —
    *
    *  1. EUC-JP: valid EUC walk AND kana evidence (an `0x8E` +
    *     half-width-katakana pair, or JIS rows A4/A5 — hiragana/
    *     katakana — carrying ≥¼ of the pairs; Japanese text is
    *     kana-heavy, Korean/Chinese text never sits in those rows).
    *  2. Shift_JIS: valid SJIS walk AND leads in 0x81–0x9F carrying
    *     ≥¼ of the pairs (SJIS puts punctuation, kana and the common
    *     kanji there; GBK parks rare extension hanzi in those rows).
    *  3. Big5: valid strict-Big5 walk (leads 0xA1–0xF9) with ≥¼ of
    *     the trails in 0x40–0x7E — traditional-Chinese text spans
    *     the low trail half heavily; EUC never, GBK-ext rarely.
    *  4. GBK by structure: valid GBK walk with any trail byte in
    *     0x40–0xA0 — impossible in the EUC family.
    *  5. EUC-KR vs GB2312-range split (structurally identical): lead
    *     bytes past 0xC8 (beyond the hangul block, dense hanzi rows)
    *     on ≥15% of pairs → gbk, else euc-kr.
    *
    * Known ambiguity, accepted: kanji-only Japanese (no kana in the
    * scanned window) is byte-indistinguishable from Chinese in the
    * EUC/GBK ranges and lands on the Chinese side.
    *
    * Requires ≥8 high bytes and ≥4 clean pairs (the cp1252 page with
    * a couple of accents must never sniff CJK); a walk with any
    * violation disqualifies its candidate. Returns the JVM charset
    * name or null (→ the windows-1252 fallback). Sequences cut by
    * the SCAN LIMIT are tolerated, cut by the body end are not —
    * the looksUtf8 discipline. */
  private[sources] def sniffCjk(b: Array[Byte], limit: Int = 4096): String = {
    val n = math.min(b.length, limit)
    var hi = 0
    var i = 0
    while (i < n) { if ((b(i) & 0xff) >= 0x80) hi += 1; i += 1 }
    if (hi < 8) return null
    val cut = n < b.length // a pair cut at the scan limit is tolerated
    // generic two-byte walk: (pairs, violations, distinctive, highLead)
    final class W { var pairs = 0; var bad = 0; var key = 0; var hiLead = 0 }
    def walkSjis(): W = {
      val w = new W; var i = 0
      while (i < n) {
        val c = b(i) & 0xff
        if (c < 0x80 || (c >= 0xa1 && c <= 0xdf)) i += 1 // ASCII | kana single
        else if ((c >= 0x81 && c <= 0x9f) || (c >= 0xe0 && c <= 0xfc)) {
          if (i + 1 >= n) { if (!cut) w.bad += 1; i = n }
          else {
            val t = b(i + 1) & 0xff
            if (t >= 0x40 && t <= 0xfc && t != 0x7f) {
              w.pairs += 1; if (c <= 0x9f) w.key += 1; i += 2
            } else { w.bad += 1; i += 1 }
          }
        } else { w.bad += 1; i += 1 }
      }
      w
    }
    def walkEuc(jp: Boolean): W = {
      val w = new W; var i = 0
      while (i < n) {
        val c = b(i) & 0xff
        if (c < 0x80) i += 1
        else if (jp && c == 0x8e) { // EUC-JP half-width katakana
          if (i + 1 >= n) { if (!cut) w.bad += 1; i = n }
          else {
            val t = b(i + 1) & 0xff
            if (t >= 0xa1 && t <= 0xdf) { w.pairs += 1; w.key += 1; i += 2 }
            else { w.bad += 1; i += 1 }
          }
        } else if (c >= 0xa1 && c <= 0xfe) {
          if (i + 1 >= n) { if (!cut) w.bad += 1; i = n }
          else {
            val t = b(i + 1) & 0xff
            if (t >= 0xa1 && t <= 0xfe) {
              w.pairs += 1
              if (jp && (c == 0xa4 || c == 0xa5)) w.key += 1 // kana rows
              if (c > 0xc8) w.hiLead += 1
              i += 2
            } else { w.bad += 1; i += 1 }
          }
        } else { w.bad += 1; i += 1 }
      }
      w
    }
    def walkGbk(): W = {
      val w = new W; var i = 0
      while (i < n) {
        val c = b(i) & 0xff
        if (c < 0x80) i += 1
        else if (c >= 0x81 && c <= 0xfe) {
          if (i + 1 >= n) { if (!cut) w.bad += 1; i = n }
          else {
            val t = b(i + 1) & 0xff
            if (t >= 0x40 && t <= 0xfe && t != 0x7f) {
              w.pairs += 1
              if (t <= 0xa0) w.key += 1 // low trail: EUC-impossible
              if (c > 0xc8) w.hiLead += 1
              i += 2
            } else { w.bad += 1; i += 1 }
          }
        } else { w.bad += 1; i += 1 }
      }
      w
    }
    def walkBig5(): W = { // lead 0xA1–0xF9, trail 0x40–0x7E | 0xA1–0xFE
      val w = new W; var i = 0
      while (i < n) {
        val c = b(i) & 0xff
        if (c < 0x80) i += 1
        else if (c >= 0xa1 && c <= 0xf9) {
          if (i + 1 >= n) { if (!cut) w.bad += 1; i = n }
          else {
            val t = b(i + 1) & 0xff
            if ((t >= 0x40 && t <= 0x7e) || (t >= 0xa1 && t <= 0xfe)) {
              w.pairs += 1
              if (t <= 0x7e) w.key += 1 // low trail: EUC-impossible
              i += 2
            } else { w.bad += 1; i += 1 }
          }
        } else { w.bad += 1; i += 1 }
      }
      w
    }
    val eucjp = walkEuc(jp = true)
    val sjis = walkSjis()
    val gbk = walkGbk()
    val euckr = walkEuc(jp = false)
    val big5 = walkBig5()
    def ok(w: W) = w.bad == 0 && w.pairs >= 4
    if (ok(eucjp) && eucjp.key * 4 >= eucjp.pairs) "euc-jp"
    else if (ok(sjis) && sjis.key * 4 >= sjis.pairs) "shift_jis"
    // Big5 before the GBK low-trail rule: traditional-Chinese text
    // puts ~40% of its trails in 0x40–0x7E (both Big5 levels span
    // the low half), while simplified GBK text's low trails are the
    // rare GBK-ext rows — a HIGH low-trail fraction under a strict
    // Big5 walk (leads 0xA1–0xF9 only) is Big5 evidence, a low-but-
    // nonzero one under the wider GBK walk is GBK-ext evidence.
    else if (ok(big5) && big5.key >= 2 && big5.key * 4 >= big5.pairs) "big5"
    else if (ok(gbk) && gbk.key > 0) "gbk"
    else if (ok(euckr) || ok(gbk)) {
      val w = if (ok(euckr)) euckr else gbk
      if (w.hiLead * 100 >= w.pairs * 15) "gbk" else "euc-kr"
    } else null
  }

  /** Decode an HTML body with its declared charset (never throws). */
  private[sources] def decodeHtml(body: Array[Byte],
                                  contentType: Option[String]): (String, String) = {
    val cs = htmlCharset(contentType, body)
    val s = try new String(body, cs)
      catch { case _: Exception =>
        new String(body, java.nio.charset.StandardCharsets.UTF_8) }
    (s, cs)
  }

  // ==== cell-form DataFrame surface ==================================

  /** The fence counters every WARC pass exposes, aggregated inside the
    * existing plan via `observe` (retry-safe, no extra pass — the
    * [[graft.core.Counters]] machinery). Read the Observation after an
    * action: containers_dropped > 0 means whole files contributed ZERO
    * rows (over-fence gzip, not-WARC bytes, I/O failure before the
    * first record); a mid-stream I/O death AFTER records were emitted
    * counts `io_error_partial` under containers_truncated (ADVICE
    * r13 — such a container is cut short, not absent); records_capped
    * / bodies_truncated name per-record fence cuts. */
  private def withFenceCounters(rows: DataFrame, name: String): (DataFrame, Observation) = {
    // walks that decode HTTP payloads also carry a per-container
    // undecodable-body count; the listing/raw walks don't
    val undec =
      if (rows.columns.contains("__undec_n"))
        sum(coalesce(col("__undec_n"), lit(0)).cast("long"))
      else lit(0L)
    graft.core.Counters.observed(
      rows.withColumn("__is_sentinel", col("record_idx") < 0),
      name,
      "containers" -> sum(when(col("__is_sentinel"), 1L).otherwise(0L)),
      "rows_out" -> sum(when(!col("__is_sentinel"), 1L).otherwise(0L)),
      "containers_dropped" -> sum(when(col("__is_sentinel") &&
        col("__end_reason").isin("not_warc", "inflate_over_fence", "empty",
          "io_error"),
        1L).otherwise(0L)),
      "containers_truncated" -> sum(when(col("__is_sentinel") &&
        col("__end_reason").isin("truncated", "corrupt", "io_error_partial"),
        1L).otherwise(0L)),
      "records_capped" -> sum(when(col("__is_sentinel") &&
        (col("__end_reason") === "record_cap"), 1L).otherwise(0L)),
      "bodies_truncated" -> sum(coalesce(col("__truncated_n"), lit(0)).cast("long")),
      "bodies_undecodable" -> undec)
  }

  /** One row per WARC record (no body bytes — the listing). Fence
    * drops are loud: see [[describeWarcObserved]]; this wrapper keeps
    * the public schema and discards the counter handle. */
  def describeWarc(media: DataFrame, maxRecords: Int = 1 << 12): DataFrame =
    describeWarcObserved(media, maxRecords)._1

  /** [[describeWarc]] plus the fence-counter Observation (read it
    * after an action completes). */
  def describeWarcObserved(media: DataFrame,
                           maxRecords: Int = 1 << 12): (DataFrame, Observation) = {
    val spark = media.sparkSession
    import spark.implicits._
    val raw = media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        val parse = parseWarcOutcome(p, maxRecords, maxBody = 0)
        val recs = parse.records.map(r =>
          (id, r.recordIdx, r.warcType, Option(r.targetUri), r.contentLength,
            r.httpStatus, r.contentType, null.asInstanceOf[String], 0))
        // one sentinel per container carries the walk outcome — the
        // loudness channel for files that yield zero records
        recs :+ ((id, -1, null.asInstanceOf[String], None: Option[String], -1L,
          None: Option[Int], None: Option[String], parse.endReason,
          parse.truncatedBodies))
      }
      .toDF("media_id", "record_idx", "warc_type", "target_uri",
        "content_length", "http_status", "content_type",
        "__end_reason", "__truncated_n")
    val (observed, obs) = withFenceCounters(raw, "warc_fences")
    (observed.where(col("record_idx") >= 0)
      .drop("__end_reason", "__truncated_n", "__is_sentinel"), obs)
  }

  /** Revisit-resolution input — one row per RESPONSE (with its
    * routed carrier text and payload digest) or REVISIT record (with
    * the capture it refers to: `WARC-Refers-To-Target-URI` +
    * `WARC-Payload-Digest`, the identical-payload-digest dedup form
    * crawlers like Common Crawl emit instead of re-storing unchanged
    * bodies). A downstream equi-join on the canonicalized URL
    * resolves each revisit to the stored capture — crawl-side dedup
    * made queryable. Map-only flatMap; bodies never shuffle. */
  def warcCaptures(media: DataFrame, maxRecords: Int = 1 << 12,
                   maxBody: Int = 1 << 24): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        parseWarcOutcome(p, maxRecords, maxBody).records.flatMap { r =>
          if (r.warcType.equalsIgnoreCase("revisit"))
            Seq((id, r.recordIdx, "revisit", Option(r.targetUri),
              r.refersTo, r.payloadDigest, None: Option[String],
              None: Option[String]))
          else routeDocRecord(r).map { case (carrier, text, _, _, _) =>
            (id, r.recordIdx, "response", Option(r.targetUri),
              None: Option[String], r.payloadDigest, Some(carrier),
              Some(text))
          }
        }
      }
      .toDF("media_id", "record_idx", "kind", "url", "refers_to",
        "digest", "carrier", "text")
  }

  /** Redirect edges — one row per RESPONSE record that moves the
    * page: a 3xx with a `Location` header, or (r18) ANY status with
    * an HTTP `Refresh: N; url=…` response header ([[redirectEdge]]).
    * Schema (media_id, record_idx, url, status,
    * location, target) where `target` is the Location RESOLVED
    * against the request URL ([[resolveLocation]]: absolute,
    * protocol-relative, root-relative and path-relative forms) and
    * canonicalized. Feed into [[graft.ops.Redirects.resolve]] to
    * collapse chains onto final page identities — the crawl-side
    * URL aliasing that fetch-URL dedup misses (a page fetched via
    * its old URL and its new one is ONE identity). Map-only flatMap;
    * bodies never read. */
  def warcRedirects(media: DataFrame, maxRecords: Int = 1 << 12): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        parseWarcOutcome(p, maxRecords, maxBody = 0).records.flatMap { r =>
          redirectEdge(r).map { case (st, raw, tgt) =>
            (id, r.recordIdx, r.targetUri, st, raw, tgt)
          }
        }
      }
      .toDF("media_id", "record_idx", "url", "status", "location", "target")
  }

  /** The redirect edge one record contributes, if any: a 3xx
    * `Location` (authoritative when present), else an HTTP `Refresh:`
    * response header with a URL (r18 verdict missing item 3 — the
    * non-standard but real `Refresh: 0; url=…` server behavior that
    * browsers honor; same WHATWG content syntax as the q354 meta
    * tag, same [[resolveLocation]], same edge schema; a URL-less
    * `Refresh: 5` self-reload is no move). Returns
    * (status, raw header value, resolved canonical target). */
  private def redirectEdge(r: WarcRecord): Option[(Int, String, String)] = {
    if (r.targetUri == null) return None
    val loc = (r.httpStatus, r.location) match {
      case (Some(st), Some(l)) if st >= 300 && st < 400 =>
        val tgt = resolveLocation(r.targetUri, l)
        if (tgt == null) None else Some((st, l, tgt))
      case _ => None
    }
    loc.orElse {
      (r.httpStatus, r.refresh) match {
        case (Some(st), Some(rv)) =>
          val u = graft.functions.HtmlMeta.parseRefreshContent(rv)
          if (u == null) None
          else {
            val tgt = resolveLocation(r.targetUri, u)
            if (tgt == null) None else Some((st, rv, tgt))
          }
        case _ => None
      }
    }
  }

  /** Resolve an HTTP `Location` value against the request URL
    * (RFC 9110 §10.2.2 allows relative references): absolute
    * http(s) URLs pass through (any OTHER scheme — mailto:, tel:,
    * javascript:, ftp: — yields null: non-web targets are not page
    * identities, and non-hierarchical forms must never resolve as
    * if path-relative); `//host/...` takes the base scheme;
    * `/path` takes the base origin; other relative forms resolve
    * against the base URL's directory. The result is canonicalized
    * ([[graft.functions.CanonicalUrl]] — case/port/dot-segment
    * normalization, IDN fold) so chain joins key on page identity.
    * Null for unusable inputs — never a throw. */
  private[graft] def resolveLocation(base: String, loc: String): String = {
    if (loc == null || base == null) return null
    val l = loc.trim
    if (l.isEmpty) return null
    val abs =
      if (l.matches("(?i)^[a-z][a-z0-9+.-]*:.*")) {
        // a scheme is present (with or without //): only hierarchical
        // http(s) targets join the identity graph. Non-hierarchical
        // Location values (mailto:, tel:, javascript:) must NOT fall
        // into the path-relative branch and fabricate edges like
        // http://host/dir/mailto:x (ADVICE r18).
        if (l.matches("(?i)^https?://.*")) l else return null
      }
      else {
        val schemeEnd = base.indexOf("://")
        if (schemeEnd < 0) return null
        val scheme = base.substring(0, schemeEnd)
        val hostStart = schemeEnd + 3
        val pathStart = {
          val i = base.indexOf('/', hostStart)
          if (i < 0) base.length else i
        }
        val origin = base.substring(0, pathStart)
        if (l.startsWith("//")) scheme + ":" + l
        else if (l.startsWith("/")) origin + l
        else {
          // path-relative: resolve against the base path's directory
          val path = if (pathStart < base.length)
            base.substring(pathStart) else "/"
          val q = path.indexOf('?')
          val p0 = if (q >= 0) path.substring(0, q) else path
          val dir = p0.substring(0, p0.lastIndexOf('/') + 1)
          origin + dir + l
        }
      }
    val canon = graft.functions.CanonicalUrl.canonicalize(abs)
    if (canon == null) abs else canon
  }

  /** The crawl-to-text pass: HTML response bodies (2xx, text/html)
    * through [[graft.functions.HtmlToText]]'s kernel — one row per
    * page with its URL, the charset it decoded with (HTTP header,
    * bounded meta sniff, utf-8 fallback — see [[htmlCharset]]) and
    * training text. flatMap kernel; bodies never shuffle, only the
    * extracted text does. Fence drops are loud: [[warcHtmlTextObserved]]. */
  def warcHtmlText(media: DataFrame, maxRecords: Int = 1 << 12,
                   maxBody: Int = 1 << 24): DataFrame =
    warcHtmlTextObserved(media, maxRecords, maxBody)._1

  /** [[warcHtmlText]] plus the fence-counter Observation. */
  def warcHtmlTextObserved(media: DataFrame, maxRecords: Int = 1 << 12,
                           maxBody: Int = 1 << 24): (DataFrame, Observation) = {
    val spark = media.sparkSession
    import spark.implicits._
    val raw = media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        val parse = parseWarcOutcome(p, maxRecords, maxBody)
        val pages = parse.records.collect {
          case r if r.warcType.equalsIgnoreCase("response") &&
              r.httpStatus.exists(s => s >= 200 && s < 300) &&
              r.contentType.exists(_.toLowerCase(java.util.Locale.ROOT)
                .startsWith("text/html")) && r.body.nonEmpty =>
            val (html, cs) = decodeHtml(r.body, r.contentType)
            (id, r.recordIdx, Option(r.targetUri), cs,
              graft.functions.HtmlToText.clean(html),
              null.asInstanceOf[String], 0, 0)
        }
        pages :+ ((id, -1, None: Option[String], null.asInstanceOf[String],
          null.asInstanceOf[String], parse.endReason,
          parse.truncatedBodies, parse.undecodableBodies))
      }
      .toDF("media_id", "record_idx", "url", "charset", "text",
        "__end_reason", "__truncated_n", "__undec_n")
    val (observed, obs) = withFenceCounters(raw, "warc_fences")
    (observed.where(col("record_idx") >= 0)
      .drop("__end_reason", "__truncated_n", "__undec_n", "__is_sentinel"), obs)
  }

  /** Multi-carrier crawl-to-text: ONE pass that routes each 2xx
    * response body by its content type — text/html through the
    * [[graft.functions.HtmlToText]] kernel, application/pdf through
    * [[Pdf.extractPdfText]] — and emits a unified (url, carrier,
    * text) row per extractable document. This is the curation front
    * door for real corpora, where the second-biggest text carrier
    * after HTML is PDF; unroutable or undecodable bodies simply
    * contribute no row (the fence counters stay loud for container-
    * level failures). Same flatMap-kernel scale posture as
    * [[warcHtmlText]]: bodies never shuffle, only extracted text. */
  def warcDocText(media: DataFrame, maxRecords: Int = 1 << 12,
                  maxBody: Int = 1 << 24): DataFrame =
    warcDocTextObserved(media, maxRecords, maxBody)._1

  /** The ONE content-type router shared by the cell walk
    * ([[warcDocTextObserved]]) and the streaming path
    * ([[warcPathsDocTextObserved]]): a 2xx response record with a
    * routable content type yields (carrier, text); everything else
    * yields None. New carriers are added HERE and exist on both
    * doors at once.
    *
    * Besides (carrier, text) every routed record carries its
    * extraction-confidence counters — today only the PDF Type0 path
    * has one (codes decoded vs codes the /ToUnicode CMap left to the
    * Identity fallback, the q314 mojibake signal); every other
    * carrier reports (0, 0), which the curation gate
    * `unmapped * 5 <= codes` passes vacuously — and its declared
    * canonical URL (the html `link rel=canonical`, null elsewhere),
    * so URL-keyed dedup can consolidate syndicated fetch URLs onto
    * the publisher's one canonical (curation v13). */
  private def routeDocRecord(r: WarcRecord): Option[(String, String, Long, Long, String)] = {
    val ok = r.warcType.equalsIgnoreCase("response") &&
      r.httpStatus.exists(s => s >= 200 && s < 300) && r.body.nonEmpty
    val ct = r.contentType.map(_.toLowerCase(java.util.Locale.ROOT))
    if (!ok) return None
    if (ct.exists(_.startsWith("application/pdf")))
      return Pdf.extractPdfText(r.body)
        .map(t => ("pdf", t.text, t.type0Codes, t.type0Unmapped,
          null.asInstanceOf[String]))
    if (ct.exists(_.startsWith("text/html"))) {
      val (html, _) = decodeHtml(r.body, r.contentType)
      return Some(("html", graft.functions.HtmlToText.clean(html), 0L, 0L,
        graft.functions.HtmlMeta.extract(html).canonical.orNull))
    }
    val routed: Option[(String, String)] =
    if (ct.exists(c => c.startsWith("text/markdown") ||
        c.startsWith("text/x-markdown"))) {
      val (md, _) = decodeHtml(r.body, r.contentType) // charset negotiation
      Some(("markdown", graft.functions.MarkdownToText.clean(md)))
    } else if (ct.exists(c => c.startsWith("application/x-tex") ||
        c.startsWith("application/x-latex") ||
        c.startsWith("text/x-tex"))) {
      val (tex, _) = decodeHtml(r.body, r.contentType)
      Some(("latex", graft.functions.LatexToText.clean(tex)))
    } else if (ct.exists(_.startsWith(
        "application/vnd.openxmlformats-officedocument.wordprocessingml"))) {
      OfficeText.docxText(r.body).map(("docx", _))
    } else if (ct.exists(_.startsWith(
        "application/vnd.openxmlformats-officedocument.presentationml"))) {
      OfficeText.pptxText(r.body).map(("pptx", _))
    } else if (ct.exists(_.startsWith(
        "application/vnd.openxmlformats-officedocument.spreadsheetml"))) {
      OfficeText.xlsxText(r.body).map(("xlsx", _))
    } else if (ct.exists(_.startsWith(
        "application/vnd.oasis.opendocument.text"))) {
      OfficeText.odtText(r.body).map(("odt", _))
    } else if (ct.exists(c => c.startsWith("application/msword") ||
        c.startsWith("application/vnd.ms-word"))) {
      Ole2.docToText(r.body).map(("doc", _))
    } else if (ct.exists(c => c.startsWith("application/vnd.ms-excel") ||
        c.startsWith("application/x-msexcel") ||
        c.startsWith("application/excel"))) {
      Ole2.xlsToText(r.body).filter(_.nonEmpty).map(("xls", _))
    } else if (ct.exists(c => c.startsWith("application/vnd.ms-powerpoint") ||
        c.startsWith("application/mspowerpoint") ||
        c.startsWith("application/powerpoint"))) {
      Ole2.pptToText(r.body).filter(_.nonEmpty).map(("ppt", _))
    } else if (ct.exists(_.startsWith("message/rfc822"))) {
      Mime.parseEml(r.body).filter(_.text.nonEmpty).map(d => ("eml", d.text))
    } else if (ct.exists(c => c.startsWith("application/rss+xml") ||
        c.startsWith("application/atom+xml") ||
        // generic XML types carry feeds constantly — root-sniffed
        c.startsWith("application/xml") || c.startsWith("text/xml"))) {
      val (xml, _) = decodeHtml(r.body, r.contentType) // charset negotiation
      Feed.feedToText(xml).filter(_.text.nonEmpty).map(d => (d.kind, d.text))
    } else if (ct.exists(c => c.startsWith("application/rtf") ||
        c.startsWith("text/rtf") || c.startsWith("application/x-rtf"))) {
      val (rtf, _) = decodeHtml(r.body, r.contentType)
      Some(("rtf", graft.functions.RtfToText.clean(rtf)))
    } else if (ct.exists(_.startsWith("application/epub+zip"))) {
      OfficeText.epubText(r.body).map(("epub", _))
    } else None
    routed.map { case (c, t) => (c, t, 0L, 0L, null.asInstanceOf[String]) }
  }

  /** [[warcDocText]] plus the fence-counter Observation. */
  def warcDocTextObserved(media: DataFrame, maxRecords: Int = 1 << 12,
                          maxBody: Int = 1 << 24): (DataFrame, Observation) = {
    val spark = media.sparkSession
    import spark.implicits._
    val raw = media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        val parse = parseWarcOutcome(p, maxRecords, maxBody)
        val rows = parse.records.flatMap { r =>
          routeDocRecord(r).map { case (carrier, text, codes, unmapped, canon) =>
            (id, r.recordIdx, Option(r.targetUri), carrier, text,
              r.xRobotsTag, codes, unmapped, Option(canon), r.encoding,
              null.asInstanceOf[String], 0, 0)
          }
        }
        rows :+ ((id, -1, None: Option[String], null.asInstanceOf[String],
          null.asInstanceOf[String], None: Option[String], 0L, 0L,
          None: Option[String], null.asInstanceOf[String],
          parse.endReason, parse.truncatedBodies, parse.undecodableBodies))
      }
      .toDF("media_id", "record_idx", "url", "carrier", "text",
        "x_robots", "type0_codes", "type0_unmapped", "canonical", "encoding",
        "__end_reason", "__truncated_n", "__undec_n")
    val (observed, obs) = withFenceCounters(raw, "warc_fences")
    (observed.where(col("record_idx") >= 0)
      .drop("__end_reason", "__truncated_n", "__undec_n", "__is_sentinel"), obs)
  }

  /** ONE walk emitting page rows AND redirect edges — the decode-once
    * input for redirect-aware curation ([[graft.llm.Curation
    * .v16Batch]]). Running [[warcDocText]] and [[warcRedirects]]
    * separately scans (and gunzips) every container twice — the r17
    * double-decode lesson; this router emits both row kinds from one
    * pass, discriminated by `kind` ('page' rows carry the doc-text
    * columns, 'redirect' rows carry status + the resolved canonical
    * `target`). Callers persist the frame once and filter twice (the
    * q232 diamond discipline). */
  def warcDocRows(media: DataFrame, maxRecords: Int = 1 << 12,
                  maxBody: Int = 1 << 24): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        parseWarcOutcome(p, maxRecords, maxBody).records.flatMap { r =>
          // a record can contribute BOTH kinds: a 2xx interstitial
          // with a `Refresh:` header is a page AND a redirect edge
          // (3xx records never route as pages, so the common case
          // stays one row per record)
          val page = routeDocRecord(r).map {
            case (carrier, text, codes, unmapped, canon) =>
              (id, r.recordIdx, "page", Option(r.targetUri), carrier, text,
                r.xRobotsTag, codes, unmapped, Option(canon),
                None: Option[Int], None: Option[String])
          }
          val edge = redirectEdge(r).map { case (st, _, tgt) =>
            (id, r.recordIdx, "redirect", Option(r.targetUri),
              null.asInstanceOf[String], null.asInstanceOf[String],
              None: Option[String], 0L, 0L, None: Option[String],
              Some(st), Some(tgt))
          }
          page.toSeq ++ edge.toSeq
        }
      }
      .toDF("media_id", "record_idx", "kind", "url", "carrier", "text",
        "x_robots", "type0_codes", "type0_unmapped", "canonical",
        "status", "target")
  }

  /** The streaming-path multi-carrier router — [[warcDocText]] over
    * FILE PATHS (the 100 TB front door): one task per path, records
    * stream one at a time through the bounded reader and route
    * through the SAME [[routeDocRecord]] as the cell walk, so every
    * carrier exists on both doors by construction. Schema and fence
    * contract of [[warcPathsHtmlText]] plus carrier and x_robots. */
  def warcPathsDocText(spark: SparkSession, paths: Seq[String],
                       maxBody: Int = 1 << 24,
                       maxRecords: Int = 1 << 20): DataFrame =
    warcPathsDocTextObserved(spark, paths, maxBody, maxRecords)._1

  /** [[warcPathsDocText]] plus the fence-counter Observation. */
  def warcPathsDocTextObserved(spark: SparkSession, paths: Seq[String],
                               maxBody: Int = 1 << 24,
                               maxRecords: Int = 1 << 20): (DataFrame, Observation) = {
    import spark.implicits._
    val n = math.max(1, math.min(paths.size, spark.sparkContext.defaultParallelism))
    val raw = spark.createDataset(paths).repartition(n)
      .flatMap { path =>
        streamRows[(String, Int, Option[String], String, String,
            Option[String], Long, Long, Option[String], String, String, Int, Int)](
          path, maxBody, maxRecords,
          r => routeDocRecord(r).map { case (carrier, text, codes, unmapped, canon) =>
            (path, r.recordIdx, Option(r.targetUri), carrier, text,
              r.xRobotsTag, codes, unmapped, Option(canon), r.encoding,
              null.asInstanceOf[String], 0, 0)
          },
          (reason, tb, un) => (path, -1, None: Option[String],
            null.asInstanceOf[String], null.asInstanceOf[String],
            None: Option[String], 0L, 0L, None: Option[String],
            null.asInstanceOf[String], reason, tb, un))
      }
      .toDF("path", "record_idx", "url", "carrier", "text", "x_robots",
        "type0_codes", "type0_unmapped", "canonical", "encoding",
        "__end_reason", "__truncated_n", "__undec_n")
    val (observed, obs) = withFenceCounters(raw, "warc_paths_fences")
    (observed.where(col("record_idx") >= 0)
      .drop("__end_reason", "__truncated_n", "__undec_n", "__is_sentinel"), obs)
  }

  /** The RAW decoded page surface: like [[warcHtmlText]] but emitting
    * the charset-decoded HTML string itself instead of extracted
    * text — the input for block-structured consumers
    * ([[graft.functions.HtmlBlocks]] main-content extraction), which
    * need tag structure the flat text pass has already discarded.
    * Same gates (2xx, text/html, non-empty body), same fence
    * counters. */
  def warcHtmlPages(media: DataFrame, maxRecords: Int = 1 << 12,
                    maxBody: Int = 1 << 24): DataFrame =
    warcHtmlPagesObserved(media, maxRecords, maxBody)._1

  /** [[warcHtmlPages]] plus the fence-counter Observation. */
  def warcHtmlPagesObserved(media: DataFrame, maxRecords: Int = 1 << 12,
                            maxBody: Int = 1 << 24): (DataFrame, Observation) = {
    val spark = media.sparkSession
    import spark.implicits._
    val raw = media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        val parse = parseWarcOutcome(p, maxRecords, maxBody)
        val pages = parse.records.collect {
          case r if r.warcType.equalsIgnoreCase("response") &&
              r.httpStatus.exists(s => s >= 200 && s < 300) &&
              r.contentType.exists(_.toLowerCase(java.util.Locale.ROOT)
                .startsWith("text/html")) && r.body.nonEmpty =>
            val (html, cs) = decodeHtml(r.body, r.contentType)
            (id, r.recordIdx, Option(r.targetUri), cs, r.xRobotsTag, html,
              null.asInstanceOf[String], 0)
        }
        pages :+ ((id, -1, None: Option[String], null.asInstanceOf[String],
          None: Option[String],
          null.asInstanceOf[String], parse.endReason, parse.truncatedBodies))
      }
      .toDF("media_id", "record_idx", "url", "charset", "x_robots", "html",
        "__end_reason", "__truncated_n")
    val (observed, obs) = withFenceCounters(raw, "warc_fences")
    (observed.where(col("record_idx") >= 0)
      .drop("__end_reason", "__truncated_n", "__is_sentinel"), obs)
  }

  // ==== split-streaming path reader (the 100 TB front door) ==========
  //
  // A real Common Crawl WARC is ~1 GB gzipped / several GB inflated —
  // it cannot be a row cell (the 64 MB inflate fence above, and the
  // JVM's 2 GB array bound). These functions take FILE PATHS and
  // stream records one at a time with bounded memory: per record, at
  // most the header block (64 KiB cap) plus min(Content-Length,
  // max(maxBody, 8 KiB)) body bytes are ever resident; everything
  // else is skipped on the wire. Gzip is decoded member-by-member as
  // it streams (GZIPInputStream concatenates Common Crawl's
  // member-per-record form natively), so total container size never
  // matters. This is the split-discipline analog of the reference's
  // LineRecordReader (hadoop: LIB/input/LineRecordReader.java:55) —
  // one task owns one file, records stream through it.

  /** Bounded streaming record walk over one (possibly gzipped or
    * zstd-compressed) WARC stream. `next()` returns null at end of
    * walk; `endReason` then
    * says why (same vocabulary as [[WarcParse]], plus `io_error` for
    * a stream dead before its first record and `io_error_partial`
    * for one dying after records were already emitted). */
  private[sources] final class WarcStream(raw: java.io.InputStream,
                                          maxBody: Int,
                                          maxRecords: Int = 1 << 20) {
    var endReason: String = null
    var truncatedBodies: Int = 0
    var undecodableBodies: Int = 0
    private var idx = 0
    // gzip / zstd / passthrough by magic — the shared archive-door
    // sniff (Common Crawl distributes .warc.gz AND .warc.zst)
    private val in: java.io.InputStream = Archives.sniffDecompress(raw)
    private val maxHeaderBlock = 1 << 16

    /** Fill exactly n bytes unless EOF; returns bytes read. */
    private def readFully(buf: Array[Byte], n: Int): Int = {
      var off = 0
      while (off < n) {
        val r = in.read(buf, off, n - off)
        if (r < 0) return off
        off += r
      }
      off
    }
    private def skipFully(n: Long): Long = {
      var left = n
      val buf = new Array[Byte](1 << 16)
      while (left > 0) {
        val r = in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
        if (r < 0) return n - left
        left -= r
      }
      n
    }

    def next(): WarcRecord = {
      if (endReason != null) return null
      try nextInner()
      catch {
        case _: java.io.IOException =>
          // records may already have been emitted — a mid-stream I/O
          // death is a TRUNCATED container (ADVICE r13); only a file
          // that dies before its first record is a zero-row drop
          endReason = if (idx == 0) "io_error" else "io_error_partial"
          null
      }
    }

    private def nextInner(): WarcRecord = {
      if (idx >= maxRecords) { endReason = "record_cap"; return null }
      // skip inter-record CR/LF separators, find the header block
      var b = in.read()
      while (b == '\r' || b == '\n') b = in.read()
      if (b < 0) { endReason = if (idx == 0) "empty" else "ok"; return null }
      val hdr = new java.io.ByteArrayOutputStream(512)
      hdr.write(b)
      // read to the blank line (\n\n or \r\n\r\n), bounded
      var tail = b & 0xff // rolling window of the last bytes, packed
      var done = false
      while (!done && hdr.size < maxHeaderBlock) {
        val c = in.read()
        if (c < 0) { endReason = if (idx == 0) "not_warc" else "corrupt"; return null }
        hdr.write(c)
        tail = (tail << 8) | (c & 0xff)
        // \n\n, \n\r\n (the cell path's findBlank forms) or \r\n\r\n
        if ((tail & 0xffff) == 0x0a0a || (tail & 0xffffff) == 0x0a0d0a ||
            tail == 0x0d0a0d0a) done = true
      }
      if (!done) { endReason = "corrupt"; return null }
      val block = hdr.toByteArray
      if (!startsWith(block, 0, "WARC/")) {
        endReason = if (idx == 0) "not_warc" else "corrupt"; return null
      }
      val headers = parseHeaders(block, nextLine(block, 0), block.length)
      val wType = headers.getOrElse("warc-type", "")
      val uri = headers.getOrElse("warc-target-uri", null)
      val clen =
        try headers.getOrElse("content-length", "-1").trim.toLong
        catch { case _: NumberFormatException => -1L }
      if (clen < 0) { endReason = "corrupt"; return null }
      // buffer the bounded payload prefix: enough for the HTTP header
      // parse even in listing mode (maxBody = 0), never more than the
      // fence; skip the rest on the wire
      val keepN = math.min(clen, math.max(maxBody, 8192).toLong).toInt
      val payload = new Array[Byte](keepN)
      val got = readFully(payload, keepN)
      val skipped = if (got == keepN) skipFully(clen - keepN) else 0L
      val shortRead = got < keepN || skipped < clen - keepN
      // ---- response records: HTTP status + headers + body -----------
      var status: Option[Int] = None
      var ctype: Option[String] = None
      var xRobots: Option[String] = None
      var location: Option[String] = None
      var refreshH: Option[String] = None
      var body: Array[Byte] = Array.emptyByteArray
      var bodyCut = false
      var enc = "identity"
      if (wType.equalsIgnoreCase("response") && startsWith(payload, 0, "HTTP/")) {
        val httpHeaderEnd = findBlank(payload, 0)
        if (httpHeaderEnd > 0 && httpHeaderEnd <= got) {
          val parts = lineAt(payload, 0).split(" ", 3)
          if (parts.length >= 2 && parts(1).forall(_.isDigit) &&
              parts(1).nonEmpty && parts(1).length <= 3)
            status = Some(parts(1).toInt)
          val hh = parseHeaders(payload, nextLine(payload, 0), httpHeaderEnd)
          ctype = hh.get("content-type")
          xRobots = hh.get("x-robots-tag")
          location = hh.get("location")
          refreshH = hh.get("refresh")
          val bl = clen - httpHeaderEnd // true HTTP body length
          if (bl > 0 && bl <= maxBody && httpHeaderEnd + bl <= got) {
            body = java.util.Arrays.copyOfRange(payload, httpHeaderEnd,
              (httpHeaderEnd + bl).toInt)
            // wire form → entity form, the same decode as the cell
            // door (r16 item 1: both doors by construction)
            val (decoded, label) = decodeHttpPayload(body,
              hh.get("transfer-encoding"), hh.get("content-encoding"), maxBody)
            body = decoded
            enc = label
            if (label.indexOf('!') >= 0) undecodableBodies += 1
          }
          else if (bl > 0 && maxBody > 0) {
            bodyCut = true
            truncatedBodies += 1
          }
        }
      }
      val rec = WarcRecord(idx, wType, uri, clen, status, ctype, body,
        bodyCut, xRobots, encoding = enc, location = location,
        refresh = refreshH)
      idx += 1
      if (shortRead) endReason = "truncated" // emit this record, then stop
      rec
    }
  }

  /** Rows from one path: each record mapped through `mk` (None rows
    * skipped), then ONE sentinel row carrying the walk outcome; the
    * stream closes when the iterator drains. Lazy — at no point is
    * more than one record resident. */
  private def streamRows[T](path: String, maxBody: Int, maxRecords: Int,
                            mk: WarcRecord => Option[T],
                            sentinel: (String, Int, Int) => T): Iterator[T] = {
    var stream: java.io.InputStream = null
    val ws =
      try {
        val p = new org.apache.hadoop.fs.Path(path)
        // executor-side Configuration (loads core-site.xml from the
        // classpath, so hdfs://, s3a:// and file:// all resolve the
        // same way they do for Spark's own readers) — ONE per JVM,
        // never per file: constructing it per path re-parses the XML
        // resources and dominated many-small-file walks (r19)
        val fs = p.getFileSystem(graft.core.Engine.executorHadoopConf)
        stream = fs.open(p)
        new WarcStream(stream, maxBody, maxRecords)
      } catch {
        case _: Exception =>
          if (stream != null) { try stream.close() catch { case _: Exception => () } }
          return Iterator.single(sentinel("io_error", 0, 0))
      }
    new Iterator[T] {
      private var pending: Option[T] = None
      private var sentinelSent = false
      private def advance(): Unit = {
        while (pending.isEmpty && !sentinelSent) {
          val r = ws.next()
          if (r == null) {
            try stream.close() catch { case _: Exception => () }
            pending = Some(sentinel(ws.endReason, ws.truncatedBodies,
              ws.undecodableBodies))
            sentinelSent = true
          } else pending = mk(r)
        }
      }
      def hasNext: Boolean = { advance(); pending.nonEmpty }
      def next(): T = { advance(); val v = pending.get; pending = None; v }
    }
  }

  /** The record listing over FILE PATHS — [[describeWarc]]'s streaming
    * sibling for containers too large to be row cells. One task per
    * path; memory is bounded per record, never per file. Schema:
    * (path, record_idx, warc_type, target_uri, content_length,
    * http_status, content_type). Fence drops are loud via the same
    * `warc_fences` counters. */
  def describeWarcPaths(spark: SparkSession, paths: Seq[String],
                        maxRecords: Int = 1 << 20): DataFrame =
    describeWarcPathsObserved(spark, paths, maxRecords)._1

  /** [[describeWarcPaths]] plus the fence-counter Observation. */
  def describeWarcPathsObserved(spark: SparkSession, paths: Seq[String],
                                maxRecords: Int = 1 << 20): (DataFrame, Observation) = {
    import spark.implicits._
    val n = math.max(1, math.min(paths.size, spark.sparkContext.defaultParallelism))
    val raw = spark.createDataset(paths).repartition(n)
      .flatMap { path =>
        streamRows[(String, Int, String, Option[String], Long, Option[Int],
            Option[String], String, Int)](path, maxBody = 0, maxRecords,
          r => Some((path, r.recordIdx, r.warcType, Option(r.targetUri),
            r.contentLength, r.httpStatus, r.contentType,
            null.asInstanceOf[String], 0)),
          (reason, tb, _) => (path, -1, null.asInstanceOf[String],
            None: Option[String], -1L, None: Option[Int],
            None: Option[String], reason, tb))
      }
      .toDF("path", "record_idx", "warc_type", "target_uri",
        "content_length", "http_status", "content_type",
        "__end_reason", "__truncated_n")
    val (observed, obs) = withFenceCounters(raw, "warc_paths_fences")
    (observed.where(col("record_idx") >= 0)
      .drop("__end_reason", "__truncated_n", "__is_sentinel"), obs)
  }

  /** The crawl-to-text pass over FILE PATHS — [[warcHtmlText]]'s
    * streaming sibling: 2xx text/html bodies, charset-aware decode,
    * [[graft.functions.HtmlToText]]. Schema: (path, record_idx, url,
    * charset, text). */
  def warcPathsHtmlText(spark: SparkSession, paths: Seq[String],
                        maxBody: Int = 1 << 24,
                        maxRecords: Int = 1 << 20): DataFrame =
    warcPathsHtmlTextObserved(spark, paths, maxBody, maxRecords)._1

  /** [[warcPathsHtmlText]] plus the fence-counter Observation. */
  def warcPathsHtmlTextObserved(spark: SparkSession, paths: Seq[String],
                                maxBody: Int = 1 << 24,
                                maxRecords: Int = 1 << 20): (DataFrame, Observation) = {
    import spark.implicits._
    val n = math.max(1, math.min(paths.size, spark.sparkContext.defaultParallelism))
    val raw = spark.createDataset(paths).repartition(n)
      .flatMap { path =>
        streamRows[(String, Int, Option[String], String, String, String, Int, Int)](
          path, maxBody, maxRecords,
          r => if (r.warcType.equalsIgnoreCase("response") &&
              r.httpStatus.exists(s => s >= 200 && s < 300) &&
              r.contentType.exists(_.toLowerCase(java.util.Locale.ROOT)
                .startsWith("text/html")) && r.body.nonEmpty) {
            val (html, cs) = decodeHtml(r.body, r.contentType)
            Some((path, r.recordIdx, Option(r.targetUri), cs,
              graft.functions.HtmlToText.clean(html),
              null.asInstanceOf[String], 0, 0))
          } else None,
          (reason, tb, un) => (path, -1, None: Option[String],
            null.asInstanceOf[String], null.asInstanceOf[String], reason, tb, un))
      }
      .toDF("path", "record_idx", "url", "charset", "text",
        "__end_reason", "__truncated_n", "__undec_n")
    val (observed, obs) = withFenceCounters(raw, "warc_paths_fences")
    (observed.where(col("record_idx") >= 0)
      .drop("__end_reason", "__truncated_n", "__undec_n", "__is_sentinel"), obs)
  }
}
