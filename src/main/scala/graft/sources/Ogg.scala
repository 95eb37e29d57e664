package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pure-JVM Ogg container walk (RFC 3533) — the info tier for the
  * web's streaming-audio container, the sibling of
  * [[Multimodal.parseMp3]]: page structure, logical-stream
  * demultiplexing by serial number, packet accounting from lacing
  * values (255-continuation spans included), codec identification
  * from the first packet of each BOS page (Vorbis / Opus / Theora /
  * FLAC-in-Ogg / Skeleton), channels + sample rate from the Vorbis
  * and Opus ID headers, and duration from the last granule position
  * (Vorbis: PCM samples at the stream rate; Opus: 48 kHz units minus
  * pre-skip). Page CRCs (the spec's direct-form CRC-32, poly
  * 0x04C11DB7) are VERIFIED — a corrupt page ends that stream's walk
  * at the last good page. Codec payload decode (Vorbis/Opus packets)
  * is the same class of non-goal as MP3 frame audio; the container
  * facts a curation pipeline filters on are all here.
  *
  * Hostile bytes never throw; None without a valid BOS page.
  * Map-only flatMap kernel. */
object Ogg {

  final case class OggStream(serial: Long, codec: String, channels: Int,
                             sampleRate: Int, nPages: Int, nPackets: Long,
                             lastGranule: Long, durationMs: Long)

  def looksLikeOgg(b: Array[Byte]): Boolean =
    b != null && b.length >= 27 && b(0) == 'O' && b(1) == 'g' &&
      b(2) == 'g' && b(3) == 'S'

  /** The spec's CRC-32: direct form, poly 0x04C11DB7, init/xorout 0. */
  private[sources] def crcOgg(b: Array[Byte], from: Int, until: Int): Long = {
    var c = 0
    var i = from
    while (i < until) {
      c ^= (b(i) & 0xff) << 24
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04c11db7 else c << 1
        k += 1
      }
      i += 1
    }
    c.toLong & 0xffffffffL
  }

  /** Max logical streams tracked per payload (hostile-mux fence). */
  val MaxStreams = 64

  private final class StreamAcc(val serial: Long) {
    var codec: String = "unknown"
    var channels = 0
    var rate = 0
    var preSkip = 0
    var nPages = 0
    var nPackets = 0L
    var lastGranule = -1L
    var sawFirstPacket = false
  }

  /** All logical streams of one Ogg payload (see object doc). */
  def parseOgg(bytes: Array[Byte]): Option[Seq[OggStream]] = {
    if (!looksLikeOgg(bytes)) return None
    val streams = scala.collection.mutable.LinkedHashMap.empty[Long, StreamAcc]
    var off = 0
    var sawValid = false
    def u8(i: Int) = bytes(i) & 0xff
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)
    def le64(i: Int): Long = le32(i) | (le32(i + 4) << 32)
    var go = true
    while (go && off + 27 <= bytes.length) {
      if (!(bytes(off) == 'O' && bytes(off + 1) == 'g' &&
          bytes(off + 2) == 'g' && bytes(off + 3) == 'S' &&
          u8(off + 4) == 0)) { go = false }
      else {
        val hdrType = u8(off + 5)
        val granule = le64(off + 6)
        val serial = le32(off + 14)
        val crc = le32(off + 22)
        val nSegs = u8(off + 26)
        val segTable = off + 27
        if (segTable + nSegs > bytes.length) { go = false }
        else {
          var payload = 0
          var i = 0
          while (i < nSegs) { payload += u8(segTable + i); i += 1 }
          val pageEnd = segTable + nSegs + payload
          if (pageEnd > bytes.length) { go = false }
          else {
            // CRC check with the CRC field zeroed (spec rule)
            val copy = java.util.Arrays.copyOfRange(bytes, off, pageEnd)
            copy(22) = 0; copy(23) = 0; copy(24) = 0; copy(25) = 0
            if (crcOgg(copy, 0, copy.length) != crc) { go = false }
            else {
              sawValid = true
              val acc = streams.getOrElseUpdate(serial, {
                if (streams.size >= MaxStreams) return Some(result(streams))
                new StreamAcc(serial)
              })
              acc.nPages += 1
              if (granule != -1L) acc.lastGranule =
                math.max(acc.lastGranule, granule)
              // packets end at lacing values < 255
              i = 0
              while (i < nSegs) {
                if (u8(segTable + i) < 255) acc.nPackets += 1
                i += 1
              }
              if ((hdrType & 2) != 0 && !acc.sawFirstPacket && nSegs > 0) {
                acc.sawFirstPacket = true
                identifyCodec(bytes, segTable + nSegs, pageEnd, acc)
              }
              off = pageEnd
            }
          }
        }
      }
    }
    if (!sawValid) None else Some(result(streams))
  }

  private def identifyCodec(b: Array[Byte], from: Int, until: Int,
                            acc: StreamAcc): Unit = {
    def u8(i: Int) = b(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)
    def has(sig: String, at: Int): Boolean =
      until - (from + at) >= sig.length &&
        sig.indices.forall(k => (b(from + at + k) & 0xff) == sig.charAt(k))
    if (has("vorbis", 0) && until - from >= 16) {
      acc.codec = "vorbis"
      acc.channels = u8(from + 11)
      acc.rate = le32(from + 12).toInt
    } else if (has("OpusHead", 0) && until - from >= 19) {
      acc.codec = "opus"
      acc.channels = u8(from + 9)
      acc.preSkip = le16(from + 10)
      acc.rate = le32(from + 12).toInt // input rate; granule is 48 kHz
    } else if (has("theora", 0)) acc.codec = "theora"
    else if (has("FLAC", 0)) acc.codec = "flac"
    else if (has("fishead", 0)) acc.codec = "skeleton"
  }

  private def result(m: scala.collection.mutable.LinkedHashMap[Long, StreamAcc]): Seq[OggStream] =
    m.values.map { a =>
      val g = math.max(0L, a.lastGranule)
      val durMs = a.codec match {
        case "vorbis" if a.rate > 0 => g * 1000L / a.rate
        case "opus" => math.max(0L, g - a.preSkip) * 1000L / 48000L
        case _ => 0L
      }
      OggStream(a.serial, a.codec, a.channels, a.rate, a.nPages,
        a.nPackets, a.lastGranule, durMs)
    }.toSeq

  // ---------------------------------------------------------- write

  /** Deterministic Ogg writer: one logical stream, a BOS page with a
    * Vorbis or Opus ID header, `nDataPages` data pages of
    * `packetsPerPage` small packets (plus one spec-shaped oversized
    * packet spanning lacing 255 when `spanPacket`), the final page
    * EOS-flagged with `lastGranule`. Spec CRCs written for real. */
  def buildOgg(serial: Long, codec: String, channels: Int, rate: Int,
               nDataPages: Int, packetsPerPage: Int, lastGranule: Long,
               spanPacket: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def page(hdrType: Int, granule: Long, seq: Int,
             packets: Seq[Array[Byte]]): Unit = {
      val lacing = scala.collection.mutable.ArrayBuffer.empty[Int]
      packets.foreach { p =>
        var rest = p.length
        while (rest >= 255) { lacing += 255; rest -= 255 }
        lacing += rest
      }
      val payload = packets.flatten.toArray
      val hdr = new Array[Byte](27 + lacing.length)
      hdr(0) = 'O'; hdr(1) = 'g'; hdr(2) = 'g'; hdr(3) = 'S'
      hdr(4) = 0; hdr(5) = hdrType.toByte
      var k = 0
      while (k < 8) { hdr(6 + k) = ((granule >> (8 * k)) & 0xff).toByte; k += 1 }
      k = 0
      while (k < 4) { hdr(14 + k) = ((serial >> (8 * k)) & 0xff).toByte; k += 1 }
      k = 0
      while (k < 4) { hdr(18 + k) = ((seq >> (8 * k)) & 0xff).toByte; k += 1 }
      hdr(26) = lacing.length.toByte
      lacing.zipWithIndex.foreach { case (l, i) => hdr(27 + i) = l.toByte }
      val full = hdr ++ payload
      val crc = crcOgg(full, 0, full.length)
      k = 0
      while (k < 4) { full(22 + k) = ((crc >> (8 * k)) & 0xff).toByte; k += 1 }
      out.write(full)
    }
    val idPacket: Array[Byte] = codec match {
      case "vorbis" =>
        val p = new Array[Byte](30)
        p(0) = 1
        "vorbis".getBytes("US-ASCII").copyToArray(p, 1)
        p(7) = 0; p(8) = 0; p(9) = 0; p(10) = 0 // version
        p(11) = channels.toByte
        var k = 0
        while (k < 4) { p(12 + k) = ((rate >> (8 * k)) & 0xff).toByte; k += 1 }
        p
      case "opus" =>
        val p = new Array[Byte](19)
        "OpusHead".getBytes("US-ASCII").copyToArray(p, 0)
        p(8) = 1 // version
        p(9) = channels.toByte
        p(10) = 0x38; p(11) = 1 // pre-skip 312
        var k = 0
        while (k < 4) { p(12 + k) = ((rate >> (8 * k)) & 0xff).toByte; k += 1 }
        p
      case _ =>
        ("" + codec).getBytes("ISO-8859-1")
    }
    page(2, 0L, 0, Seq(idPacket))
    var seq = 1
    var pg = 0
    while (pg < nDataPages) {
      val isLast = pg == nDataPages - 1
      val packets = (0 until packetsPerPage).map(k =>
        Array.tabulate[Byte](10 + k)(i => ((i * 31 + k * 7 + pg) & 0xff).toByte))
      val spanned =
        if (spanPacket && isLast)
          packets :+ Array.tabulate[Byte](300)(i => (i & 0xff).toByte)
        else packets
      val granule = if (isLast) lastGranule
        else lastGranule * (pg + 1) / nDataPages
      page(if (isLast) 4 else 0, granule, seq, spanned)
      seq += 1
      pg += 1
    }
    out.toByteArray
  }

  // ------------------------------------------------------ dataframe

  /** One row per LOGICAL STREAM per payload: codec, channels, rate,
    * page/packet counts, last granule, duration. Non-Ogg payloads
    * yield a single all-null row (media_id kept). */
  def describeOgg(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        parseOgg(p) match {
          case Some(ss) if ss.nonEmpty => ss.zipWithIndex.map { case (s, i) =>
            (id, i, Some(s.serial), Some(s.codec), Some(s.channels),
              Some(s.sampleRate), Some(s.nPages), Some(s.nPackets),
              Some(s.lastGranule), Some(s.durationMs))
          }
          case _ => Seq((id, 0, None: Option[Long], None: Option[String],
            None: Option[Int], None: Option[Int], None: Option[Int],
            None: Option[Long], None: Option[Long], None: Option[Long]))
        }
      }
      .toDF("media_id", "stream_idx", "serial", "codec", "channels",
        "sample_rate", "n_pages", "n_packets", "last_granule",
        "duration_ms")
  }
}
