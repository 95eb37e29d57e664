package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pure-JVM FLAC decode — the audio tier's lossless sibling of the
  * VP8L image path ([[Webp]]): full sample reconstruction from the
  * public format (RFC 9639), no codec library.
  *
  * Implemented end to end: STREAMINFO + metadata-block walk, frame
  * headers (both blocking strategies, all blocksize/sample-rate/
  * sample-size code forms, UTF-8-style coded frame/sample numbers,
  * CRC-8 verified), subframes CONSTANT / VERBATIM / FIXED (orders
  * 0–4) / LPC (orders 1–32, quantized coefficients + shift), wasted
  * bits, Rice-coded residuals (both 4- and 5-bit parameter methods,
  * partition orders, the escape-to-raw form), stereo decorrelation
  * (left/side, right/side, mid/side), CRC-16 frame footers.
  *
  * Crawled-corpus posture: hostile bytes never throw; a payload
  * without a valid fLaC/STREAMINFO prefix is None; a frame that
  * fails its CRC or runs out of bits ends the walk and the samples
  * decoded BEFORE it are returned (the truncation-clamp contract of
  * [[Multimodal.parseAu]]/parseGifFrames). [[MaxSamples]] fences
  * decoded size against hostile headers. Map-only flatMap kernels;
  * samples never shuffle. */
object Flac {

  /** Decoded-samples fence (same order as the AU fence). */
  val MaxSamples: Long = 1L << 26

  final case class FlacDecoded(sampleRate: Int, channels: Int, bits: Int,
                               totalDeclared: Long,
                               samples: Array[Array[Int]])

  def looksLikeFlac(b: Array[Byte]): Boolean =
    b != null && b.length >= 42 && b(0) == 'f' && b(1) == 'L' &&
      b(2) == 'a' && b(3) == 'C'

  // ------------------------------------------------------------ bits

  private final class BitReader(val b: Array[Byte], var pos: Long) {
    // pos in BITS; reads fail by setting `dead` (never throw)
    var dead = false
    def bitsLeft: Long = b.length.toLong * 8 - pos
    def u(n: Int): Long = {
      if (dead || n < 0 || n > 57 || bitsLeft < n) { dead = true; return 0L }
      var v = 0L
      var k = n
      while (k > 0) {
        val byteI = (pos >> 3).toInt
        val bitI = (pos & 7).toInt
        val take = math.min(k, 8 - bitI)
        val chunk = ((b(byteI) & 0xff) >> (8 - bitI - take)) & ((1 << take) - 1)
        v = (v << take) | chunk
        pos += take
        k -= take
      }
      v
    }
    def s(n: Int): Long = {
      val v = u(n)
      if (n == 0) 0L else (v << (64 - n)) >> (64 - n)
    }
    /** zero-count unary: 0…01 → count of zeros. */
    def unary(max: Int = 1 << 20): Int = {
      var q = 0
      while (!dead && q <= max) {
        if (u(1) == 1L) return q
        q += 1
      }
      dead = true; 0
    }
    def alignByte(): Unit = { pos = (pos + 7) & ~7L }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def w(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        cur = (cur << 1) | ((v >> k) & 1L).toInt
        nb += 1
        if (nb == 8) { out.write(cur); cur = 0; nb = 0 }
        k -= 1
      }
    }
    def unary(q: Int): Unit = { var k = 0; while (k < q) { w(0, 1); k += 1 }; w(1, 1) }
    def alignByte(): Unit = if (nb > 0) w(0, 8 - nb)
    def bytes: Array[Byte] = { alignByte(); out.toByteArray }
  }

  // ------------------------------------------------------------ crc

  private[sources] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      c ^= b(i) & 0xff
      var k = 0
      while (k < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff; k += 1 }
      i += 1
    }
    c
  }

  private[sources] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      c ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) { c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff; k += 1 }
      i += 1
    }
    c
  }

  // --------------------------------------------------------- decode

  /** Full sample decode (see object doc for the posture). */
  def decodeFlac(bytes: Array[Byte]): Option[FlacDecoded] = {
    if (!looksLikeFlac(bytes)) return None
    // metadata walk: STREAMINFO must be first (spec)
    var off = 4L
    def u8(i: Long) = bytes(i.toInt) & 0xff
    if (off + 4 > bytes.length) return None
    var last = (u8(off) & 0x80) != 0
    if ((u8(off) & 0x7f) != 0) return None // first block must be STREAMINFO
    var len = (u8(off + 1) << 16) | (u8(off + 2) << 8) | u8(off + 3)
    if (len < 34 || off + 4 + len > bytes.length) return None
    val si = new BitReader(bytes, (off + 4) * 8)
    si.u(16); si.u(16); si.u(24); si.u(24)
    val rate = si.u(20).toInt
    val channels = si.u(3).toInt + 1
    val bps = si.u(5).toInt + 1
    val total = si.u(36)
    if (si.dead || rate <= 0) return None
    off += 4 + len
    // remaining metadata blocks: skip by length
    while (!last) {
      if (off + 4 > bytes.length) return None
      last = (u8(off) & 0x80) != 0
      len = (u8(off + 1) << 16) | (u8(off + 2) << 8) | u8(off + 3)
      if (off + 4 + len > bytes.length) return None
      off += 4 + len
    }
    val fence = math.min(total match { case 0 => MaxSamples case t => t }, MaxSamples)
    val chans = Array.fill(channels)(new scala.collection.mutable.ArrayBuilder.ofInt)
    var decoded = 0L
    val r = new BitReader(bytes, off * 8)
    var go = true
    while (go && r.bitsLeft >= 32 && decoded < fence) {
      val frameStartByte = (r.pos >> 3).toInt
      val block = decodeFrame(r, bytes, frameStartByte, rate, channels, bps)
      block match {
        case Some(chSamples) =>
          val n = chSamples(0).length
          val take = math.min(n.toLong, fence - decoded).toInt
          var c = 0
          while (c < channels) {
            var i = 0
            while (i < take) { chans(c) += chSamples(c)(i); i += 1 }
            c += 1
          }
          decoded += take
        case None => go = false
      }
    }
    Some(FlacDecoded(rate, channels, bps, total, chans.map(_.result())))
  }

  /** One frame: None on sync/CRC/bit failure (walk ends there). */
  private def decodeFrame(r: BitReader, bytes: Array[Byte], startByte: Int,
                          siRate: Int, siChannels: Int, siBps: Int): Option[Array[Array[Int]]] = {
    if (r.u(14) != 0x3ffe) return None
    r.u(1) // reserved
    val variable = r.u(1) == 1L
    val bsCode = r.u(4).toInt
    val srCode = r.u(4).toInt
    val chAsgn = r.u(4).toInt
    val ssCode = r.u(3).toInt
    r.u(1) // reserved
    // UTF-8-style coded number (frame or sample number)
    val first = r.u(8).toInt
    if (r.dead) return None
    var extra = 0
    var f = first
    while ((f & 0x80) != 0) { extra += 1; f <<= 1 }
    if (extra == 1 || extra > (if (variable) 6 else 5) + 1) return None
    var k = 0
    while (k < math.max(0, extra - 1)) { // continuation bytes
      val c = r.u(8).toInt
      if ((c & 0xc0) != 0x80) return None
      k += 1
    }
    val blockSize = bsCode match {
      case 0 => return None
      case 1 => 192
      case n if n >= 2 && n <= 5 => 576 << (n - 2)
      case 6 => r.u(8).toInt + 1
      case 7 => r.u(16).toInt + 1
      case n => 256 << (n - 8)
    }
    srCode match { // only the get-from-end forms consume bits
      case 12 => r.u(8)
      case 13 | 14 => r.u(16)
      case 15 => return None
      case _ =>
    }
    val crcPos = (r.pos >> 3).toInt
    if (r.dead || (r.pos & 7) != 0) return None
    val hdrCrc = r.u(8).toInt
    if (crc8(bytes, startByte, crcPos) != hdrCrc) return None
    val bps = ssCode match {
      case 0 => siBps
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
      case _ => return None
    }
    val nCh = if (chAsgn <= 7) chAsgn + 1 else 2
    if (nCh != siChannels || blockSize <= 0 || blockSize > (1 << 16)) return None
    val out = Array.ofDim[Array[Int]](nCh)
    var c = 0
    while (c < nCh) {
      val isSide = (chAsgn == 8 && c == 1) || (chAsgn == 9 && c == 0) ||
        (chAsgn == 10 && c == 1)
      val sub = decodeSubframe(r, blockSize, if (isSide) bps + 1 else bps)
      if (sub == null) return None
      out(c) = sub
      c += 1
    }
    r.alignByte()
    val footPos = (r.pos >> 3).toInt
    val crc = r.u(16).toInt
    if (r.dead) return None
    if (crc16(bytes, startByte, footPos) != crc) return None
    // stereo decorrelation
    chAsgn match {
      case 8 => // left/side: R = L - side
        var i = 0
        while (i < blockSize) { out(1)(i) = out(0)(i) - out(1)(i); i += 1 }
      case 9 => // right/side: ch0 is side, ch1 is right; L = R + side
        var i = 0
        while (i < blockSize) { out(0)(i) = out(1)(i) + out(0)(i); i += 1 }
      case 10 => // mid/side
        var i = 0
        while (i < blockSize) {
          val side = out(1)(i)
          val lr2 = (out(0)(i) << 1) | (side & 1)
          out(0)(i) = (lr2 + side) >> 1
          out(1)(i) = (lr2 - side) >> 1
          i += 1
        }
      case _ =>
    }
    Some(out)
  }

  /** One subframe; null on failure. */
  private def decodeSubframe(r: BitReader, n: Int, bps: Int): Array[Int] = {
    if (r.u(1) != 0L) return null
    val typ = r.u(6).toInt
    val wastedFlag = r.u(1) == 1L
    val wasted = if (wastedFlag) r.unary(64) + 1 else 0
    if (r.dead || wasted >= bps) return null
    val ebps = bps - wasted
    val out = new Array[Int](n)
    val ok: Boolean =
      if (typ == 0) { // CONSTANT
        val v = r.s(ebps).toInt
        java.util.Arrays.fill(out, v); !r.dead
      } else if (typ == 1) { // VERBATIM
        var i = 0
        while (i < n && !r.dead) { out(i) = r.s(ebps).toInt; i += 1 }
        !r.dead
      } else if ((typ & 0x38) == 0x08 && (typ & 7) <= 4) { // FIXED
        val order = typ & 7
        var i = 0
        while (i < order && !r.dead) { out(i) = r.s(ebps).toInt; i += 1 }
        if (r.dead || !decodeResidual(r, out, n, order)) false
        else {
          var j = order
          while (j < n) {
            val p = order match {
              case 0 => 0L
              case 1 => out(j - 1).toLong
              case 2 => 2L * out(j - 1) - out(j - 2)
              case 3 => 3L * out(j - 1) - 3L * out(j - 2) + out(j - 3)
              case _ => 4L * out(j - 1) - 6L * out(j - 2) + 4L * out(j - 3) - out(j - 4)
            }
            out(j) = (out(j) + p).toInt
            j += 1
          }
          true
        }
      } else if ((typ & 0x20) != 0) { // LPC
        val order = (typ & 0x1f) + 1
        if (order > n) return null
        var i = 0
        while (i < order && !r.dead) { out(i) = r.s(ebps).toInt; i += 1 }
        val precM1 = r.u(4).toInt
        if (precM1 == 15 || r.dead) return null
        val prec = precM1 + 1
        val shift = r.s(5).toInt
        if (shift < 0) return null
        val coefs = new Array[Long](order)
        i = 0
        while (i < order && !r.dead) { coefs(i) = r.s(prec); i += 1 }
        if (r.dead || !decodeResidual(r, out, n, order)) false
        else {
          var j = order
          while (j < n) {
            var acc = 0L
            var t = 0
            while (t < order) { acc += coefs(t) * out(j - 1 - t); t += 1 }
            out(j) = (out(j) + (acc >> shift)).toInt
            j += 1
          }
          true
        }
      } else false
    if (!ok) return null
    if (wasted > 0) {
      var i = 0
      while (i < n) { out(i) = out(i) << wasted; i += 1 }
    }
    out
  }

  /** Rice-coded residual into out(order until n); false on failure. */
  private def decodeResidual(r: BitReader, out: Array[Int], n: Int, order: Int): Boolean = {
    val method = r.u(2).toInt
    if (method > 1 || r.dead) return false
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val po = r.u(4).toInt
    val parts = 1 << po
    if (n % parts != 0) return false
    val perPart = n / parts
    var idx = order
    var p = 0
    while (p < parts) {
      val count = if (p == 0) perPart - order else perPart
      if (count < 0) return false
      val param = r.u(pBits).toInt
      if (r.dead) return false
      if (param == escape) {
        val raw = r.u(5).toInt
        var i = 0
        while (i < count) {
          out(idx) = if (raw == 0) 0 else r.s(raw).toInt
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < count) {
          val q = r.unary()
          val rem = if (param == 0) 0L else r.u(param)
          val u = (q.toLong << param) | rem
          out(idx) = ((u >>> 1) ^ -(u & 1L)).toInt
          idx += 1; i += 1
        }
      }
      if (r.dead) return false
      p += 1
    }
    true
  }

  // ---------------------------------------------------------- write

  /** Deterministic FLAC writer — the replay oracle's fixture source.
    * `variant`: "constant" (every block one CONSTANT subframe per
    * channel — callers supply per-block-constant data), "verbatim",
    * "fixed2" (order-2 FIXED, Rice partition order 1 when the block
    * divides evenly), "lpc2" (order-2 LPC, coefficients [3,-1],
    * shift 1), "midside" / "leftside" (stereo decorrelation with
    * VERBATIM mid/left and the side channel FIXED order 1). The
    * encoding is bit-exact round-trippable by construction — FLAC is
    * lossless — so a decoder that shortcuts any path fails the
    * variant's sample sums. */
  def buildFlac(channels: Seq[Array[Int]], sampleRate: Int, bps: Int,
                blockSize: Int, variant: String): Array[Byte] = {
    require(channels.nonEmpty && channels.forall(_.length == channels.head.length))
    val nCh = channels.length
    val total = channels.head.length
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    val si = new BitWriter
    si.w(0x80, 8) // last block, type 0
    si.w(34, 24)
    si.w(blockSize, 16); si.w(blockSize, 16)
    si.w(0, 24); si.w(0, 24)
    si.w(sampleRate, 20)
    si.w(nCh - 1, 3)
    si.w(bps - 1, 5)
    si.w(total, 36)
    (0 until 16).foreach(_ => si.w(0, 8))
    out.write(si.bytes)
    var done = 0
    var frameIdx = 0L
    while (done < total) {
      val n = math.min(blockSize, total - done)
      out.write(buildFrame(channels, done, n, frameIdx, nCh, bps, variant))
      done += n
      frameIdx += 1
    }
    out.toByteArray
  }

  /** FLAC's UTF-8-style coded number (payload bits with k bytes:
    * 5k + 1, so 2 bytes carry 11 bits … 7 bytes carry 36). */
  private def utf8Coded(v: Long): Seq[Int] =
    if (v < 0x80) Seq(v.toInt)
    else {
      var nBytes = 2
      while (nBytes < 7 && v >= (1L << (5 * nBytes + 1))) nBytes += 1
      val contBits = 6 * (nBytes - 1)
      val lead = ((0xff << (8 - nBytes)) & 0xff) | (v >> contBits).toInt
      lead +: (1 until nBytes).map(i =>
        0x80 | ((v >> (contBits - 6 * i)) & 0x3f).toInt)
    }

  private def buildFrame(channels: Seq[Array[Int]], from: Int, n: Int,
                         frameIdx: Long, nCh: Int, bps: Int,
                         variant: String): Array[Byte] = {
    val w = new BitWriter
    val chAsgn = variant match {
      case "midside" => 10
      case "leftside" => 8
      case _ => nCh - 1
    }
    w.w(0x3ffe, 14); w.w(0, 1); w.w(0, 1)
    w.w(7, 4)      // blocksize: 16-bit at end
    w.w(0, 4)      // sample rate: streaminfo
    w.w(chAsgn, 4)
    w.w(bps match { case 8 => 1 case 12 => 2 case 16 => 4 case 20 => 5 case 24 => 6 case 32 => 7 case _ => 0 }, 3)
    w.w(0, 1)
    utf8Coded(frameIdx).foreach(b => w.w(b, 8))
    w.w(n - 1, 16)
    val hdr = w.bytes // byte-aligned here by construction
    val w2 = new BitWriter
    hdr.foreach(b => w2.w(b & 0xff, 8))
    w2.w(crc8(hdr, 0, hdr.length), 8)
    // subframes
    val data: Seq[Array[Int]] = chAsgn match {
      case 10 =>
        val l = channels(0); val r = channels(1)
        val mid = Array.tabulate(n)(i => (l(from + i) + r(from + i)) >> 1)
        val side = Array.tabulate(n)(i => l(from + i) - r(from + i))
        Seq(mid, side)
      case 8 =>
        val l = channels(0); val r = channels(1)
        Seq(Array.tabulate(n)(i => l(from + i)),
          Array.tabulate(n)(i => l(from + i) - r(from + i)))
      case _ => channels.map(ch => Array.tabulate(n)(i => ch(from + i)))
    }
    data.zipWithIndex.foreach { case (s, c) =>
      val isSide = (chAsgn == 10 || chAsgn == 8) && c == 1
      val ebps = if (isSide) bps + 1 else bps
      val sfVariant =
        if (chAsgn == 10 || chAsgn == 8) { if (isSide) "fixed1" else "verbatim" }
        else variant
      writeSubframe(w2, s, ebps, sfVariant)
    }
    val body = { w2.alignByte(); w2.bytes }
    val w3 = new BitWriter
    body.foreach(b => w3.w(b & 0xff, 8))
    w3.w(crc16(body, 0, body.length), 16)
    w3.bytes
  }

  private def writeSubframe(w: BitWriter, s: Array[Int], bps: Int,
                            variant: String): Unit = {
    val n = s.length
    variant match {
      case "constant" =>
        w.w(0, 1); w.w(0, 6); w.w(0, 1)
        w.w(s(0).toLong & ((1L << bps) - 1), bps)
      case "fixed1" =>
        w.w(0, 1); w.w(0x08 | 1, 6); w.w(0, 1)
        w.w(s(0).toLong & ((1L << bps) - 1), bps)
        val res = Array.tabulate(n - 1)(i => s(i + 1).toLong - s(i))
        writeRice(w, res, 1, 0, n)
      case "fixed2" =>
        val order = if (n > 2) 2 else 0
        w.w(0, 1); w.w(0x08 | order, 6); w.w(0, 1)
        var i = 0
        while (i < order) { w.w(s(i).toLong & ((1L << bps) - 1), bps); i += 1 }
        val res = Array.tabulate(n - order)(i =>
          if (order == 2) s(i + 2).toLong - 2L * s(i + 1) + s(i) else s(i).toLong)
        val po = if (n % 2 == 0 && n / 2 > order) 1 else 0
        writeRice(w, res, order, po, n)
      case "lpc2" =>
        val order = if (n > 2) 2 else 0
        if (order == 0) { writeSubframe(w, s, bps, "verbatim"); return }
        w.w(0, 1); w.w(0x20 | (order - 1), 6); w.w(0, 1)
        var i = 0
        while (i < order) { w.w(s(i).toLong & ((1L << bps) - 1), bps); i += 1 }
        val prec = 4; val shift = 1
        val coefs = Array(3L, -1L)
        w.w(prec - 1, 4); w.w(shift, 5)
        coefs.foreach(c => w.w(c & ((1L << prec) - 1), prec))
        val res = Array.tabulate(n - order) { i =>
          val j = i + order
          s(j).toLong - ((coefs(0) * s(j - 1) + coefs(1) * s(j - 2)) >> shift)
        }
        writeRice(w, res, order, 0, n)
      case _ => // verbatim
        w.w(0, 1); w.w(1, 6); w.w(0, 1)
        var i = 0
        while (i < n) { w.w(s(i).toLong & ((1L << bps) - 1), bps); i += 1 }
    }
  }

  private def writeRice(w: BitWriter, res: Array[Long], order: Int,
                        po: Int, n: Int): Unit = {
    w.w(0, 2) // method 0: 4-bit params
    w.w(po, 4)
    val parts = 1 << po
    val perPart = n / parts
    var idx = 0
    var p = 0
    while (p < parts) {
      val count = if (p == 0) perPart - order else perPart
      // param: bit length of the max zigzagged value, so quotients
      // stay small; clamped below the 4-bit escape
      var maxU = 0L
      var i = 0
      while (i < count) {
        val r = res(idx + i)
        val u = (r << 1) ^ (r >> 63)
        if (u > maxU) maxU = u
        i += 1
      }
      // bitLength(maxU) - 1 keeps every quotient at <= 1 unary bit
      val bl = 64 - java.lang.Long.numberOfLeadingZeros(maxU)
      val param = math.min(14, math.max(0, bl - 1))
      w.w(param, 4)
      i = 0
      while (i < count) {
        val r = res(idx + i)
        val u = (r << 1) ^ (r >> 63)
        w.unary((u >>> param).toInt)
        if (param > 0) w.w(u & ((1L << param) - 1), param)
        i += 1
      }
      idx += count
      p += 1
    }
  }

  // ------------------------------------------------------ dataframe

  /** Per-payload FLAC facts + decoded-sample stats: one row per
    * media row — sample_rate/channels/bits/n_samples plus per-channel
    * sums and the absolute peak, all in the stream's native bit
    * depth (exact integers, replayable from the fixture formulas).
    * Nulls for non-FLAC payloads. */
  def describeFlac(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, p) =>
        decodeFlac(p) match {
          case Some(d) if d.samples.nonEmpty =>
            val n = d.samples(0).length.toLong
            def sum(c: Int): Option[Long] =
              if (c < d.channels) Some {
                var acc = 0L; val a = d.samples(c)
                var i = 0
                while (i < a.length) { acc += a(i); i += 1 }
                acc
              } else None
            var peak = 0L
            d.samples.foreach { a =>
              var i = 0
              while (i < a.length) {
                val v = math.abs(a(i).toLong)
                if (v > peak) peak = v
                i += 1
              }
            }
            (id, Some("flac"), Some(d.sampleRate), Some(d.channels),
              Some(d.bits), Some(n), sum(0), sum(1), Some(peak))
          case _ => (id, None: Option[String], None: Option[Int],
            None: Option[Int], None: Option[Int], None: Option[Long],
            None: Option[Long], None: Option[Long], None: Option[Long])
        }
      }
      .toDF("media_id", "format", "sample_rate", "channels", "bits",
        "n_samples", "sum_ch0", "sum_ch1", "peak_abs")
  }
}
