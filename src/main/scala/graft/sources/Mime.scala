package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Email carriers: RFC 5322 .eml messages and mbox mailboxes — a
  * standard pretraining source (mailing-list archives, support
  * corpora) the router previously dropped.
  *
  * The walk: header unfold (continuation lines join), RFC 2047
  * encoded-word decode in Subject/From (B and Q forms), recursive
  * multipart split on the Content-Type boundary (multipart/mixed
  * concatenates text-bearing parts in order; multipart/alternative
  * picks text/plain when present, else the html part through
  * [[graft.functions.HtmlToText]]), Content-Transfer-Encoding decode
  * (base64, quoted-printable incl. soft breaks, 7bit/8bit identity),
  * per-part charset from the Content-Type. Attachments (disposition
  * `attachment`, or any non-text leaf) are COUNTED, never decoded.
  * mbox splits on the `From ` postmark discipline (a line starting
  * "From " after a blank line or at start) and un-escapes ">From ".
  *
  * Fences: part depth ≤ 8, parts ≤ 4096 per message, messages ≤ 64k
  * per mbox, body caps; hostile input yields empty/None, never a
  * throw. Map-only per row; one linear pass per message.
  */
object Mime {

  final case class EmlDoc(subject: String, from: String, text: String,
                          nParts: Int, nAttachments: Int)

  private val MaxDepth = 8
  private val MaxParts = 4096

  // ---- header machinery -------------------------------------------

  /** Splits a header block into unfolded (name, value) pairs. */
  private[sources] def parseHeaders(s: String): Seq[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var cur: String = null
    s.split("\r?\n", -1).foreach { line =>
      if (line.nonEmpty && (line(0) == ' ' || line(0) == '\t')) {
        if (cur != null) cur = cur + " " + line.trim
      } else {
        if (cur != null) {
          val i = cur.indexOf(':')
          if (i > 0) out += ((cur.substring(0, i).trim.toLowerCase(
            java.util.Locale.ROOT), cur.substring(i + 1).trim))
        }
        cur = if (line.contains(':')) line else null
      }
    }
    if (cur != null) {
      val i = cur.indexOf(':')
      if (i > 0) out += ((cur.substring(0, i).trim.toLowerCase(
        java.util.Locale.ROOT), cur.substring(i + 1).trim))
    }
    out.toSeq
  }

  private def header(hs: Seq[(String, String)], name: String): Option[String] =
    hs.find(_._1 == name).map(_._2)

  /** RFC 2047 encoded-words: =?charset?B|Q?payload?= (Q: underscores
    * are spaces, =HH hex). Adjacent encoded words join without the
    * intervening whitespace, per spec. */
  private[sources] def decodeEncodedWords(s: String): String = {
    val re = "=\\?([^?]+)\\?([bBqQ])\\?([^?]*)\\?=".r
    val sb = new StringBuilder
    var last = 0
    var prevWasWord = false
    var prevEnd = -1
    re.findAllMatchIn(s).foreach { m =>
      val between = s.substring(last, m.start)
      if (!(prevWasWord && between.trim.isEmpty)) sb.append(between)
      prevWasWord = true
      prevEnd = m.end
      last = m.end
      val cs = try java.nio.charset.Charset.forName(m.group(1))
        catch { case _: Exception =>
          java.nio.charset.StandardCharsets.UTF_8 }
      val decoded = try {
        if (m.group(2).equalsIgnoreCase("b"))
          new String(java.util.Base64.getMimeDecoder.decode(m.group(3)), cs)
        else {
          val q = m.group(3).replace('_', ' ')
          new String(decodeQp(q.getBytes("ISO-8859-1"), softBreaks = false), cs)
        }
      } catch { case _: Exception => m.group(3) }
      sb.append(decoded)
    }
    sb.append(s.substring(last))
    sb.toString
  }

  /** quoted-printable: =HH escapes; `softBreaks` honours trailing
    * `=\n` line continuations (body form; Q-words have none). */
  private[sources] def decodeQp(b: Array[Byte],
                                softBreaks: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    def hex(c: Int): Int =
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else -1
    while (i < b.length) {
      val c = b(i) & 0xff
      if (c == '=' && i + 1 < b.length) {
        val n1 = b(i + 1) & 0xff
        if (softBreaks && (n1 == '\r' || n1 == '\n')) {
          i += (if (n1 == '\r' && i + 2 < b.length &&
            (b(i + 2) & 0xff) == '\n') 3 else 2)
        } else if (i + 2 < b.length && hex(n1) >= 0 &&
            hex(b(i + 2) & 0xff) >= 0) {
          out.write((hex(n1) << 4) | hex(b(i + 2) & 0xff))
          i += 3
        } else { out.write(c); i += 1 }
      } else { out.write(c); i += 1 }
    }
    out.toByteArray
  }

  private def ctParam(ct: String, name: String): Option[String] = {
    val re = ("(?i)" + name + "\\s*=\\s*(\"([^\"]*)\"|([^;\\s]+))").r
    re.findFirstMatchIn(ct).map(m =>
      Option(m.group(2)).getOrElse(m.group(3)))
  }

  private def charsetOf(ct: String): java.nio.charset.Charset =
    ctParam(ct, "charset").flatMap(n =>
      try Some(java.nio.charset.Charset.forName(n.trim))
      catch { case _: Exception => None })
      .getOrElse(java.nio.charset.StandardCharsets.UTF_8)

  // ---- message walk ------------------------------------------------

  private final case class Part(headers: Seq[(String, String)],
                                body: Array[Byte])

  private def splitMessage(bytes: Array[Byte]): Part = {
    // header/body split at the first blank line
    var i = 0
    var at = -1
    while (at < 0 && i + 1 < bytes.length) {
      if (bytes(i) == '\n' &&
          (bytes(i + 1) == '\n' ||
            (bytes(i + 1) == '\r' && i + 2 < bytes.length &&
              bytes(i + 2) == '\n'))) at = i
      i += 1
    }
    if (at < 0)
      Part(parseHeaders(new String(bytes, "ISO-8859-1")), Array.emptyByteArray)
    else {
      val hdrEnd = at + 1
      val bodyAt = if (bytes(at + 1) == '\r') at + 3 else at + 2
      Part(
        parseHeaders(new String(bytes, 0, hdrEnd, "ISO-8859-1")),
        java.util.Arrays.copyOfRange(bytes, bodyAt, bytes.length))
    }
  }

  private def decodeBody(p: Part): Array[Byte] = {
    val enc = header(p.headers, "content-transfer-encoding")
      .map(_.trim.toLowerCase(java.util.Locale.ROOT)).getOrElse("7bit")
    try enc match {
      case "base64" =>
        java.util.Base64.getMimeDecoder.decode(
          new String(p.body, "ISO-8859-1").filter(c =>
            !c.isWhitespace).getBytes("ISO-8859-1"))
      case "quoted-printable" => decodeQp(p.body, softBreaks = true)
      case _ => p.body
    } catch { case _: Exception => p.body }
  }

  private def splitMultipart(body: Array[Byte],
                             boundary: String): Seq[Array[Byte]] = {
    val text = new String(body, "ISO-8859-1")
    val delim = "--" + boundary
    val parts = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var i = text.indexOf(delim)
    while (i >= 0 && parts.length < MaxParts) {
      val lineEnd = text.indexOf('\n', i)
      if (lineEnd < 0) return parts.toSeq
      val marker = text.substring(i, lineEnd).trim
      if (marker == delim + "--") return parts.toSeq // closing delimiter
      val next = text.indexOf("\n" + delim, lineEnd)
      val end = if (next < 0) text.length else next
      if (marker == delim)
        parts += text.substring(lineEnd + 1, end).getBytes("ISO-8859-1")
      i = if (next < 0) -1 else next + 1
    }
    parts.toSeq
  }

  /** Collects (texts, nParts, nAttachments) from a part tree. */
  private def walkPart(p: Part, depth: Int): (Seq[String], Int, Int) = {
    if (depth > MaxDepth) return (Nil, 1, 0)
    val ct = header(p.headers, "content-type").getOrElse("text/plain")
    val ctLower = ct.toLowerCase(java.util.Locale.ROOT).trim
    val disp = header(p.headers, "content-disposition")
      .map(_.toLowerCase(java.util.Locale.ROOT).trim).getOrElse("")
    if (ctLower.startsWith("multipart/")) {
      val boundary = ctParam(ct, "boundary").getOrElse(return (Nil, 1, 0))
      val subs = splitMultipart(p.body, boundary).map(b =>
        walk(splitMessage2(b), depth))
      if (ctLower.startsWith("multipart/alternative")) {
        // pick text/plain when present, else the html leg; count all
        val nP = 1 + subs.map(_._2).sum
        val nA = subs.map(_._3).sum
        val plain = subs.zip(splitMultipart(p.body, boundary)).collectFirst {
          case ((ts, _, _), raw)
            if partCt(raw).startsWith("text/plain") && ts.nonEmpty => ts
        }
        val chosen = plain.orElse(subs.map(_._1).find(_.nonEmpty))
          .getOrElse(Nil)
        (chosen, nP, nA)
      } else {
        (subs.flatMap(_._1), 1 + subs.map(_._2).sum, subs.map(_._3).sum)
      }
    } else if (disp.startsWith("attachment")) {
      (Nil, 1, 1)
    } else if (ctLower.startsWith("text/plain")) {
      (Seq(new String(decodeBody(p), charsetOf(ct))), 1, 0)
    } else if (ctLower.startsWith("text/html")) {
      (Seq(graft.functions.HtmlToText.clean(
        new String(decodeBody(p), charsetOf(ct)))), 1, 0)
    } else if (ctLower.startsWith("message/rfc822")) {
      walk(splitMessage2(decodeBody(p)), depth) match {
        case (ts, n, a) => (ts, n + 1, a)
      }
    } else {
      (Nil, 1, 1) // non-text leaf: counted as an attachment
    }
  }

  private def partCt(raw: Array[Byte]): String =
    header(splitMessage2(raw).headers, "content-type")
      .map(_.toLowerCase(java.util.Locale.ROOT).trim).getOrElse("text/plain")

  private def splitMessage2(b: Array[Byte]): Part = splitMessage(b)

  private def walk(p: Part, depth: Int): (Seq[String], Int, Int) =
    walkPart(p, depth + 1)

  /** One .eml (or one mbox message) → subject/from/text/parts. None
    * only when the bytes have no parseable header block at all. */
  def parseEml(bytes: Array[Byte]): Option[EmlDoc] = {
    try {
      if (bytes == null || bytes.isEmpty) return None
      val msg = splitMessage(bytes)
      if (msg.headers.isEmpty) return None
      val (texts, nParts, nAtt) = walkPart(msg, 0)
      val joined = texts.map(_.replace("\r\n", "\n")).mkString("\n")
      // whitespace contract: trim line ends, drop empties, join \n
      val out = new StringBuilder
      joined.split("\n", -1).foreach { ln =>
        val t = ln.trim
        if (t.nonEmpty) {
          if (out.nonEmpty) out.append('\n')
          out.append(t)
        }
      }
      Some(EmlDoc(
        decodeEncodedWords(header(msg.headers, "subject").getOrElse("")),
        decodeEncodedWords(header(msg.headers, "from").getOrElse("")),
        out.toString, nParts, nAtt))
    } catch { case _: Throwable => None }
  }

  /** mbox → the raw bytes of each message (postmark split; ">From "
    * unescaping applied to body lines). */
  def mboxMessages(bytes: Array[Byte],
                   maxMessages: Int = 1 << 16): Seq[Array[Byte]] = {
    try {
      if (bytes == null || bytes.isEmpty) return Nil
      val s = new String(bytes, "ISO-8859-1")
      if (!s.startsWith("From ")) return Nil
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      val starts = scala.collection.mutable.ArrayBuffer(0)
      var i = s.indexOf("\nFrom ")
      while (i >= 0 && starts.length < maxMessages) {
        // a postmark only after a blank line (or any newline per the
        // common mboxo convention; escaped bodies use ">From ")
        starts += i + 1
        i = s.indexOf("\nFrom ", i + 1)
      }
      starts.zipWithIndex.foreach { case (st, k) =>
        val end = if (k + 1 < starts.length) starts(k + 1) else s.length
        // drop the "From ..." postmark line itself
        val nl = s.indexOf('\n', st)
        if (nl >= 0 && nl < end) {
          val body = s.substring(nl + 1, end)
            .replace("\n>From ", "\nFrom ")
          out += body.getBytes("ISO-8859-1")
        }
      }
      out.toSeq
    } catch { case _: Throwable => Nil }
  }

  /** Frame surface: one row per mbox message — (media_id, msg_idx,
    * subject, from, n_parts, n_attachments, text). Map-only flatMap
    * kernel; a payload that is not an mbox yields zero rows. */
  def mboxDocText(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        mboxMessages(p).zipWithIndex.flatMap { case (m, k) =>
          parseEml(m).map(d =>
            (id, k, d.subject, d.from, d.nParts, d.nAttachments, d.text))
        }
      }
      .toDF("media_id", "msg_idx", "subject", "from", "n_parts",
        "n_attachments", "text")
  }
}
