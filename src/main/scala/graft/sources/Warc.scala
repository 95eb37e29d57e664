package graft.sources

import org.apache.spark.sql.DataFrame
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
                              body: Array[Byte])

  /** Inflate a (possibly multi-member) gzip stream, fenced. Returns
    * null when not gzip or on corrupt/oversized data. */
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
      if (out.size > maxOut) null else out.toByteArray
    } catch { case _: java.io.IOException => null }
  }

  /** Parse WARC records (auto-gunzips). None = not a WARC at all;
    * truncation keeps the records before the cut. */
  def parseWarcRecords(bytes: Array[Byte], maxRecords: Int = 1 << 12,
                       maxBody: Int = 1 << 24): Option[Seq[WarcRecord]] = {
    if (bytes == null || bytes.length < 9) return None
    val data = {
      val g = gunzipAll(bytes, 1 << 26)
      if (g != null) g else bytes
    }
    if (data.length < 9 || !startsWith(data, 0, "WARC/")) return None
    val out = Seq.newBuilder[WarcRecord]
    var p = 0
    var k = 0
    while (k < maxRecords && p + 9 <= data.length && startsWith(data, p, "WARC/")) {
      // ---- WARC header block ----------------------------------------
      val headerEnd = findBlank(data, p)
      if (headerEnd < 0) return someIfAny(out, k)
      val headers = parseHeaders(data, nextLine(data, p), headerEnd)
      val wType = headers.getOrElse("warc-type", "")
      val uri = headers.getOrElse("warc-target-uri", null)
      val clen =
        try headers.getOrElse("content-length", "-1").trim.toLong
        catch { case _: NumberFormatException => -1L }
      if (clen < 0) return someIfAny(out, k)
      val bodyStart = headerEnd
      val bodyEnd = bodyStart + math.min(clen, data.length.toLong - bodyStart)
      // ---- response records: HTTP status + headers + body -----------
      var status: Option[Int] = None
      var ctype: Option[String] = None
      var body: Array[Byte] = Array.emptyByteArray
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
          val bl = (bodyEnd - httpHeaderEnd).toInt
          if (bl > 0 && bl <= maxBody)
            body = java.util.Arrays.copyOfRange(data, httpHeaderEnd, bodyEnd.toInt)
        }
      }
      out += WarcRecord(k, wType, uri, clen, status, ctype, body)
      k += 1
      // payload + the record-separating CRLFCRLF (tolerant at EOF).
      // q is Long: a hostile multi-GB Content-Length must clamp here,
      // not wrap negative through toInt (the never-throw contract).
      var q = bodyStart.toLong + clen
      if (q > data.length) return someIfAny(out, k) // truncated/lying length
      var sep = 0
      while (sep < 4 && q < data.length &&
          (data(q.toInt) == '\r' || data(q.toInt) == '\n')) { q += 1; sep += 1 }
      if (q <= p) return someIfAny(out, k) // no forward progress: corrupt
      p = q.toInt
    }
    someIfAny(out, k)
  }

  private def someIfAny(b: scala.collection.mutable.Builder[WarcRecord, Seq[WarcRecord]],
                        k: Int): Option[Seq[WarcRecord]] =
    if (k > 0) Some(b.result()) else None

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

  /** One row per WARC record (no body bytes — the listing). */
  def describeWarc(media: DataFrame, maxRecords: Int = 1 << 12): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        parseWarcRecords(p, maxRecords, maxBody = 0).getOrElse(Nil).map(r =>
          (id, r.recordIdx, r.warcType, Option(r.targetUri), r.contentLength,
            r.httpStatus, r.contentType))
      }
      .toDF("media_id", "record_idx", "warc_type", "target_uri",
        "content_length", "http_status", "content_type")
  }

  /** The crawl-to-text pass: HTML response bodies (2xx, text/html)
    * through [[graft.functions.HtmlToText]]'s kernel — one row per
    * page with its URL and training text. flatMap kernel; bodies
    * never shuffle, only the extracted text does. */
  def warcHtmlText(media: DataFrame, maxRecords: Int = 1 << 12,
                   maxBody: Int = 1 << 24): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        parseWarcRecords(p, maxRecords, maxBody).getOrElse(Nil).collect {
          case r if r.warcType.equalsIgnoreCase("response") &&
              r.httpStatus.exists(s => s >= 200 && s < 300) &&
              r.contentType.exists(_.toLowerCase(java.util.Locale.ROOT)
                .startsWith("text/html")) && r.body.nonEmpty =>
            val html = new String(r.body, java.nio.charset.StandardCharsets.UTF_8)
            (id, r.recordIdx, Option(r.targetUri),
              graft.functions.HtmlToText.clean(html))
        }
      }
      .toDF("media_id", "record_idx", "url", "text")
  }
}
