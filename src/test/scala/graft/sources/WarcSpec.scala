package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Warc]] — the crawl container walk — on hand-built WARC
  * bytes (plain, gzip whole-file AND Common-Crawl member-per-record
  * gzip), HTTP payload parsing, and the hostile posture. */
class WarcSpec extends SparkSpec {
  import spark.implicits._
  import Warc._

  private def record(wtype: String, uri: String, payload: Array[Byte],
                     extra: String = ""): Array[Byte] = {
    val hdr = (s"WARC/1.0\r\nWARC-Type: $wtype\r\n" +
      (if (uri != null) s"WARC-Target-URI: $uri\r\n" else "") + extra +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("ISO-8859-1")
    hdr ++ payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
  }

  private def httpResponse(status: Int, ctype: String, body: String): Array[Byte] =
    (s"HTTP/1.1 $status OK\r\nContent-Type: $ctype\r\n" +
      s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n").getBytes("ISO-8859-1") ++
      body.getBytes("UTF-8")

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  test("parseWarcRecords walks records; response records parse HTTP status/type/body") {
    val warc =
      record("warcinfo", null, "software: test\r\n".getBytes) ++
      record("request", "http://ex.com/a",
        "GET /a HTTP/1.1\r\nHost: ex.com\r\n\r\n".getBytes) ++
      record("response", "http://ex.com/a",
        httpResponse(200, "text/html; charset=utf-8", "<p>hello</p>")) ++
      record("response", "http://ex.com/b",
        httpResponse(404, "text/html", "<p>nope</p>"))
    val rs = parseWarcRecords(warc).get
    assert(rs.map(_.warcType) == Seq("warcinfo", "request", "response", "response"))
    assert(rs(2).targetUri == "http://ex.com/a")
    assert(rs(2).httpStatus == Some(200))
    assert(rs(2).contentType == Some("text/html; charset=utf-8"))
    assert(new String(rs(2).body, "UTF-8") == "<p>hello</p>")
    assert(rs(3).httpStatus == Some(404))
    // non-response records carry no HTTP fields
    assert(rs(0).httpStatus.isEmpty && rs(1).httpStatus.isEmpty)
    // gzip whole-file and member-per-record both decode to the same walk
    assert(parseWarcRecords(gzip(warc)).get.map(_.warcType) ==
      rs.map(_.warcType))
    val perRecord =
      gzip(record("warcinfo", null, "software: cc\r\n".getBytes)) ++
      gzip(record("response", "http://ex.com/c",
        httpResponse(200, "text/html", "<p>cc</p>")))
    val cc = parseWarcRecords(perRecord).get
    assert(cc.size == 2 && new String(cc(1).body, "UTF-8") == "<p>cc</p>")
  }

  test("refusals, truncation clamp, hostile bytes") {
    assert(parseWarcRecords(null).isEmpty)
    assert(parseWarcRecords("not a warc".getBytes).isEmpty)
    val warc = record("response", "http://x/",
      httpResponse(200, "text/html", "<p>t</p>")) ++
      record("metadata", "http://x/", "k: v\r\n".getBytes)
    // truncation keeps whole records before the cut, never throws
    (1 until warc.length by 7).foreach(n => parseWarcRecords(warc.take(n)))
    assert(parseWarcRecords(warc.take(warc.length - 10)).get.size >= 1)
    val rnd = new scala.util.Random(64)
    (1 to 300).foreach { k =>
      val c = warc.clone()
      (0 to k % 4).foreach(_ => c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte)
      parseWarcRecords(c)
    }
    // a lying Content-Length (beyond EOF) clamps, no throw
    val lying = ("WARC/1.0\r\nWARC-Type: metadata\r\n" +
      "Content-Length: 99999\r\n\r\nshort").getBytes
    assert(parseWarcRecords(lying).get.head.contentLength == 99999L)
  }

  test("describeWarc lists; warcHtmlText extracts only 2xx text/html") {
    val warc =
      record("response", "http://ex.com/good",
        httpResponse(200, "text/html", "<h1>Title</h1><p>body &amp; text</p>")) ++
      record("response", "http://ex.com/miss",
        httpResponse(404, "text/html", "<p>gone</p>")) ++
      record("response", "http://ex.com/img",
        httpResponse(200, "image/png", "fakepng")) ++
      record("request", "http://ex.com/good", "GET / HTTP/1.1\r\n\r\n".getBytes)
    val media = Multimodal.asMedia(
      Seq((1L, warc), (2L, "junk".getBytes)).toDF("id", "bytes"),
      "id", "bytes", "warc")
    val listing = Warc.describeWarc(media).orderBy("media_id", "record_idx")
      .as[(Long, Int, String, Option[String], Long, Option[Int], Option[String])]
      .collect().toSeq
    assert(listing.size == 4 && listing.map(_._3) ==
      Seq("response", "response", "response", "request"))
    val text = Warc.warcHtmlText(media)
      .as[(Long, Int, Option[String], String)].collect().toSeq
    assert(text == Seq((1L, 0, Some("http://ex.com/good"), "Title\nbody & text")))
  }
}
