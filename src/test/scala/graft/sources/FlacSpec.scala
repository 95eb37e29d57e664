package graft.sources

import graft.SparkSpec

/** Pins [[Flac]] — full lossless decode. The writer round-trips are
  * exact by construction (FLAC is lossless), and the writer/decoder
  * pair is NOT self-proving here: the residual, Rice, stereo and
  * header paths are additionally pinned by independent hand
  * assertions (CRC vectors, a hand-computed mid/side pair, escape
  * and wasted-bits forms spliced by hand). */
class FlacSpec extends SparkSpec {

  private def samples(n: Int, ch: Int, f: (Int, Int) => Int): Seq[Array[Int]] =
    (0 until ch).map(c => Array.tabulate(n)(i => f(c, i)))

  test("CRC vectors: crc8/crc16 match published check values") {
    // "123456789" -> CRC-8/ATM 0xF4, CRC-16/ARC poly 0x8005 MSB-first
    // (aka BUYPASS, init 0): 0xFEE8
    val b = "123456789".getBytes("US-ASCII")
    assert(Flac.crc8(b, 0, b.length) == 0xf4)
    assert(Flac.crc16(b, 0, b.length) == 0xfee8)
  }

  test("verbatim round-trips exactly: mono 16-bit incl. negatives") {
    val s = samples(100, 1, (_, i) => ((i * 37 + 11) % 256) - 128)
    val d = Flac.decodeFlac(Flac.buildFlac(s, 8000, 16, 64, "verbatim")).get
    assert(d.sampleRate == 8000 && d.channels == 1 && d.bits == 16)
    assert(d.samples(0).toSeq == s(0).toSeq)
  }

  test("constant and fixed2 (Rice, partition order 1) round-trip; " +
       "multi-frame walk with a short last frame") {
    val c = samples(100, 2, (ch, _) => if (ch == 0) 42 else -7)
    val dc = Flac.decodeFlac(Flac.buildFlac(c, 44100, 16, 32, "constant")).get
    assert(dc.samples(0).forall(_ == 42) && dc.samples(1).forall(_ == -7))
    assert(dc.samples(0).length == 100) // 32+32+32+4: short last frame
    val s = samples(96, 1, (_, i) => (i * i * 3 + i * 5 - 200) % 4000)
    val df = Flac.decodeFlac(Flac.buildFlac(s, 16000, 16, 48, "fixed2")).get
    assert(df.samples(0).toSeq == s(0).toSeq)
  }

  test("lpc2 (order-2 quantized LPC) round-trips") {
    val s = samples(80, 1, (_, i) => (math.sin(i * 0.3) * 1000).toInt)
    val d = Flac.decodeFlac(Flac.buildFlac(s, 22050, 16, 40, "lpc2")).get
    assert(d.samples(0).toSeq == s(0).toSeq)
  }

  test("mid/side and left/side stereo decorrelation round-trip, " +
       "including the odd-sum (side & 1) case") {
    val l = Array.tabulate(60)(i => i * 13 - 100)
    val r = Array.tabulate(60)(i => i * 7 - 355) // l+r odd at many i
    val dm = Flac.decodeFlac(Flac.buildFlac(Seq(l, r), 48000, 16, 30, "midside")).get
    assert(dm.samples(0).toSeq == l.toSeq && dm.samples(1).toSeq == r.toSeq)
    val dl = Flac.decodeFlac(Flac.buildFlac(Seq(l, r), 48000, 16, 30, "leftside")).get
    assert(dl.samples(0).toSeq == l.toSeq && dl.samples(1).toSeq == r.toSeq)
  }

  test("hand-computed mid/side pair: L=5,R=2 encodes mid=3,side=3 " +
       "and decodes back (the lost low bit rides the side channel)") {
    val d = Flac.decodeFlac(Flac.buildFlac(
      Seq(Array(5, -9), Array(2, 4)), 8000, 16, 16, "midside")).get
    assert(d.samples(0).toSeq == Seq(5, -9) && d.samples(1).toSeq == Seq(2, 4))
  }

  test("8-bit and 24-bit depths round-trip; UTF-8 coded frame " +
       "numbers past 127 (multi-byte lead) decode") {
    val s8 = samples(50, 1, (_, i) => (i % 200) - 100)
    val d8 = Flac.decodeFlac(Flac.buildFlac(s8, 8000, 8, 25, "verbatim")).get
    assert(d8.bits == 8 && d8.samples(0).toSeq == s8(0).toSeq)
    val s24 = samples(40, 1, (_, i) => i * 100000 - 2000000)
    val d24 = Flac.decodeFlac(Flac.buildFlac(s24, 96000, 24, 20, "verbatim")).get
    assert(d24.bits == 24 && d24.samples(0).toSeq == s24(0).toSeq)
    // 130 frames of 16 samples: frame index 128+ needs 2-byte coding
    val big = samples(16 * 130, 1, (_, i) => (i % 512) - 256)
    val db = Flac.decodeFlac(Flac.buildFlac(big, 8000, 16, 16, "verbatim")).get
    assert(db.samples(0).length == 16 * 130 &&
      db.samples(0).toSeq == big(0).toSeq)
  }

  // ----------------------- hand-assembled bitstreams (no writer) ---

  /** Minimal spec-side bit writer (MSB-first), independent of the
    * production one. */
  private final class HandBits {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0; private var nb = 0
    def w(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        cur = (cur << 1) | ((v >> k) & 1L).toInt; nb += 1
        if (nb == 8) { out.write(cur); cur = 0; nb = 0 }
        k -= 1
      }
    }
    def align(): Unit = if (nb > 0) w(0, 8 - nb)
    def bytes: Array[Byte] = { align(); out.toByteArray }
  }

  /** One-frame mono 16-bit stream with a hand-written subframe. */
  private def handStream(blockSize: Int, subframe: HandBits => Unit): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write("fLaC".getBytes("US-ASCII"))
    val si = new HandBits
    si.w(0x80, 8); si.w(34, 24)
    si.w(blockSize, 16); si.w(blockSize, 16); si.w(0, 24); si.w(0, 24)
    si.w(8000, 20); si.w(0, 3); si.w(15, 5) // 1 ch, 16-bit
    si.w(blockSize, 36)
    (0 until 16).foreach(_ => si.w(0, 8))
    o.write(si.bytes)
    val h = new HandBits
    h.w(0x3ffe, 14); h.w(0, 2)
    h.w(7, 4); h.w(0, 4); h.w(0, 4); h.w(4, 3); h.w(0, 1)
    h.w(0, 8) // frame 0
    h.w(blockSize - 1, 16)
    val hdr = h.bytes
    val f = new HandBits
    hdr.foreach(b => f.w(b & 0xff, 8))
    f.w(Flac.crc8(hdr, 0, hdr.length), 8)
    subframe(f)
    f.align()
    val body = f.bytes
    val t = new HandBits
    body.foreach(b => t.w(b & 0xff, 8))
    t.w(Flac.crc16(body, 0, body.length), 16)
    o.write(t.bytes)
    o.toByteArray
  }

  test("hand-assembled Rice ESCAPE partition: param 15 -> 5-bit raw " +
       "size, raw residuals; raw size 0 means all-zero") {
    // FIXED order 0 subframe: samples ARE the residuals
    val vals = Seq(17L, -30L, 5L, 0L)
    val esc = handStream(4, f => {
      f.w(0, 1); f.w(0x08, 6); f.w(0, 1) // fixed, order 0, no wasted
      f.w(0, 2)  // method 0
      f.w(0, 4)  // partition order 0
      f.w(15, 4) // ESCAPE
      f.w(6, 5)  // 6-bit raw residuals
      vals.foreach(v => f.w(v & 0x3f, 6))
    })
    assert(Flac.decodeFlac(esc).get.samples(0).toSeq == Seq(17, -30, 5, 0))
    val zero = handStream(3, f => {
      f.w(0, 1); f.w(0x08, 6); f.w(0, 1)
      f.w(0, 2); f.w(0, 4); f.w(15, 4)
      f.w(0, 5) // raw size 0: every residual is zero, zero bits follow
    })
    assert(Flac.decodeFlac(zero).get.samples(0).toSeq == Seq(0, 0, 0))
  }

  test("hand-assembled wasted bits: k=1 shifts decoded samples left " +
       "by one (VERBATIM at bps-1 carries the halved values)") {
    val full = Seq(2, -4, 6, 8)
    val ws = handStream(4, f => {
      f.w(0, 1); f.w(1, 6) // verbatim
      f.w(1, 1)            // wasted flag
      f.w(1, 1)            // unary 0 zeros -> k = 1
      full.foreach(v => f.w((v / 2).toLong & 0x7fff, 15)) // ebps = 15
    })
    assert(Flac.decodeFlac(ws).get.samples(0).toSeq == full)
  }

  test("hostile bytes never throw and return None or a clean prefix") {
    assert(Flac.decodeFlac(null).isEmpty)
    assert(Flac.decodeFlac("not flac at all".getBytes).isEmpty)
    assert(Flac.decodeFlac("fLaC".getBytes).isEmpty)
    val good = Flac.buildFlac(
      samples(64, 1, (_, i) => i - 32), 8000, 16, 32, "verbatim")
    // truncation: first frame survives, second is dropped cleanly
    val cut = Flac.decodeFlac(good.take(good.length - 10)).get
    assert(cut.samples(0).length <= 64)
    assert(cut.samples(0).take(32).toSeq ==
      (0 until 32).map(_ - 32)) // frame 1 intact
    // bit flips in the frame region: never throw; CRC drops the frame
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val bad = good.clone()
      val at = 42 + rnd.nextInt(bad.length - 42)
      bad(at) = (bad(at) ^ (1 << rnd.nextInt(8))).toByte
      Flac.decodeFlac(bad) // must not throw
    }
    (0 until 100).foreach { k =>
      val junk = new Array[Byte](60)
      rnd.nextBytes(junk)
      junk(0) = 'f'; junk(1) = 'L'; junk(2) = 'a'; junk(3) = 'C'
      Flac.decodeFlac(junk)
    }
  }

  test("describeFlac surfaces exact per-channel sums and peak") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val l = Array.tabulate(50)(i => i * 3 - 60)
    val r = Array.tabulate(50)(i => 40 - i * 2)
    val bytes = Flac.buildFlac(Seq(l, r), 44100, 16, 25, "midside")
    val df = Seq((1L, bytes), (2L, "junk".getBytes)).toDF("media_id", "payload")
    val rows = Flac.describeFlac(
        Multimodal.asMedia(df, "media_id", "payload", "audio"))
      .orderBy("media_id")
      .collect()
    assert(rows(0).getAs[String]("format") == "flac")
    assert(rows(0).getAs[Long]("n_samples") == 50L)
    assert(rows(0).getAs[Long]("sum_ch0") == l.map(_.toLong).sum)
    assert(rows(0).getAs[Long]("sum_ch1") == r.map(_.toLong).sum)
    assert(rows(0).getAs[Long]("peak_abs") ==
      math.max(l.map(v => math.abs(v.toLong)).max,
        r.map(v => math.abs(v.toLong)).max))
    assert(rows(1).isNullAt(rows(1).fieldIndex("format")))
  }
}
