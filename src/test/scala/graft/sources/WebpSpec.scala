package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Pins [[Webp]] three ways (the PdfSpec discipline):
  *
  *  1. round-trips of the deterministic writer's four variants —
  *     plain literals, SUBTRACT_GREEN, PREDICTOR (mode 1), and
  *     COLOR_INDEXING with a 19-color palette — which by
  *     construction exercise both prefix-code forms, the
  *     code-length coding, and three inverse transforms;
  *  2. INDEPENDENTLY hand-assembled bitstreams sharing no code with
  *     the writer, pinning what the writer never emits: LZ77
  *     backward references through the 2D distance map, the color
  *     cache, simple two-symbol codes, the 17/18 zero-repeat codes,
  *     and the max_symbol short form;
  *  3. hostile bytes (truncation, bit flips, lying sizes) — the
  *     never-throw fence.
  */
class WebpSpec extends SparkSpec {
  import spark.implicits._

  private def formulaPx(seed: Int)(x: Int, y: Int): (Int, Int, Int) =
    (((seed * 7 + x * 13 + y * 29) % 256),
      ((seed * 5 + x * 3 + y * 11) % 256),
      ((seed * 3 + x + y * 7) % 256))

  private def expectedSums(w: Int, h: Int,
                           px: (Int, Int) => (Int, Int, Int)): (Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      sr += r; sg += g; sb += b
    }
    (sr, sg, sb)
  }

  test("writer round-trips: plain, subtract-green, predictor, palette") {
    val (w, h) = (21, 13)
    for (variant <- Seq("plain", "subgreen", "predictor")) {
      val bytes = Webp.buildLosslessWebp(w, h, formulaPx(5), variant)
      val s = Webp.parseWebp(bytes).getOrElse(fail(s"$variant: no parse"))
      assert(s.variant == "lossless" && s.width == w && s.height == h)
      assert(s.nPixels == w.toLong * h)
      val (er, eg, eb) = expectedSums(w, h, formulaPx(5))
      assert((s.sumR, s.sumG, s.sumB) == ((er, eg, eb)), variant)
      assert(s.sumA == 255L * w * h, variant)
    }
    // every predictor mode round-trips, including the TR modes whose
    // right-edge rule wraps to the current row's first pixel
    for (mode <- 0 to 13) {
      val bytes = Webp.buildLosslessWebp(w, h, formulaPx(mode + 40),
        s"predictor:$mode")
      val s = Webp.parseWebp(bytes).getOrElse(fail(s"mode $mode: no parse"))
      val (er, eg, eb) = expectedSums(w, h, formulaPx(mode + 40))
      assert((s.sumR, s.sumG, s.sumB) == ((er, eg, eb)), s"mode $mode")
    }
    // palette: 19 distinct colors, first row covers every index
    def palPx(x: Int, y: Int): (Int, Int, Int) = {
      val idx = if (y == 0) x % 19 else (x * 7 + y * 3 + 5) % 19
      ((15 + idx) % 256, (25 + idx * 29) % 256, (35 + idx * 41) % 256)
    }
    val bytes = Webp.buildLosslessWebp(w, h, palPx, "palette")
    val s = Webp.parseWebp(bytes).getOrElse(fail("palette: no parse"))
    val (er, eg, eb) = expectedSums(w, h, palPx)
    assert((s.sumR, s.sumG, s.sumB) == ((er, eg, eb)))
    // 1×1 and wide-thin edges round-trip too
    for ((ww, hh) <- Seq((1, 1), (37, 1), (1, 29))) {
      val b2 = Webp.buildLosslessWebp(ww, hh, formulaPx(9), "plain")
      val s2 = Webp.parseWebp(b2).get
      val (r2, g2, b2s) = expectedSums(ww, hh, formulaPx(9))
      assert((s2.width, s2.height, s2.sumR, s2.sumG, s2.sumB) ==
        ((ww, hh, r2, g2, b2s)))
    }
  }

  // ---- hand-assembled bitstreams (no writer code) -----------------

  private final class HandBits {
    private val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var n = 0
    def b(v: Int): this.type = {
      cur |= (v & 1) << n; n += 1
      if (n == 8) { out += cur.toByte; cur = 0; n = 0 }
      this
    }
    def i(v: Int, bits: Int): this.type = { // LSB-first integer
      (0 until bits).foreach(k => b((v >> k) & 1)); this
    }
    def c(v: Int, bits: Int): this.type = { // MSB-first prefix code
      (bits - 1 to 0 by -1).foreach(k => b((v >> k) & 1)); this
    }
    def riff: Array[Byte] = {
      if (n > 0) { out += cur.toByte; cur = 0; n = 0 }
      val payload = out.toArray
      val bos = new java.io.ByteArrayOutputStream()
      def w32(v: Int): Unit =
        (0 until 4).foreach(k => bos.write((v >> (8 * k)) & 0xff))
      bos.write("RIFF".getBytes); w32(4 + 8 + payload.length + (payload.length & 1))
      bos.write("WEBP".getBytes); bos.write("VP8L".getBytes)
      w32(payload.length); bos.write(payload)
      if ((payload.length & 1) == 1) bos.write(0)
      bos.toByteArray
    }
  }

  test("hand fixture: LZ77 copies through the 2D distance map, " +
       "normal code via 18-repeats and max_symbol") {
    // 4×2, one literal + seven copy-of-previous. Green code: normal,
    // nonzero lengths only at {50 (literal), 256 (length code 0)},
    // both 1 bit -> canonical 50->0, 256->1. Lengths are coded with
    // cl symbols {1, 18}: 18 skips the zero runs, max_symbol stops
    // after symbol 256.
    val hb = new HandBits
    hb.i(0x2f, 8).i(3, 14).i(1, 14).b(0).i(0, 3) // header: 4×2
    hb.b(0) // no transforms
    hb.b(0) // no color cache
    hb.b(0) // no meta
    // green: not simple; numCodeLengths=4 (order: 17,18,0,1)
    hb.b(0).i(0, 4)
    hb.i(0, 3) // cl[17] = 0
    hb.i(1, 3) // cl[18] = 1
    hb.i(0, 3) // cl[0]  = 0
    hb.i(1, 3) // cl[1]  = 1   -> canonical: 1->0, 18->1
    // max_symbol short form: it caps the number of CODE-LENGTH
    // SYMBOL READS (not the filled-symbol index) — this fixture
    // makes exactly 5 reads (18, 1, 18, 18, 1), so
    // max_symbol = 5 = 2 + ReadBits(2 + 2*0 = 2 bits -> 3)
    hb.b(1).i(0, 3).i(3, 2)
    // lengths: 18(repeat 50 zeros: 11+39) sym->0..49; 1 at sym 50;
    // 18(138 zeros: 11+127) sym 51..188; 18(67 zeros: 11+56) 189..255;
    // 1 at sym 256; max_symbol stops the rest
    hb.c(1, 1).i(39, 7)  // code 18, 50 zeros
    hb.c(0, 1)           // code 1 -> length 1 at symbol 50
    hb.c(1, 1).i(127, 7) // code 18, 138 zeros
    hb.c(1, 1).i(56, 7)  // code 18, 67 zeros
    hb.c(0, 1)           // code 1 -> length 1 at symbol 256
    // red: simple-1(7); blue: simple-1(9); alpha: simple-1(255)
    hb.b(1).b(0).b(1).i(7, 8)
    hb.b(1).b(0).b(1).i(9, 8)
    hb.b(1).b(0).b(1).i(255, 8)
    // distance: simple-1(1) -> distCode = lz77Value(1) = 2 ->
    // map[1] = (1, 0) -> previous pixel
    hb.b(1).b(0).b(1).i(1, 8)
    // data: literal green 50 (code 0), then 7× {length symbol 256
    // (code 1) -> length = lz77Value(0) = 1; distance 0 bits}
    hb.c(0, 1)
    (1 to 7).foreach(_ => hb.c(1, 1))
    val s = Webp.parseWebp(hb.riff).getOrElse(fail("no parse"))
    assert((s.width, s.height, s.nPixels) == ((4, 2, 8L)))
    assert((s.sumR, s.sumG, s.sumB, s.sumA) ==
      ((7L * 8, 50L * 8, 9L * 8, 255L * 8)))
  }

  test("hand fixture: a LINEAR distance code (> 120) copies from " +
       "dist = code - 120") {
    // 5×1: literal, then a 4-pixel copy at distance 4 wrapping the
    // single literal... no — length 4 copy from dist 4 needs 4 prior
    // pixels; use 4 literals then ONE copy of the first pixel:
    // distCode 124 -> dist 4. distSym 13 (offset 96, 5 extra bits,
    // value 27 -> 96 + 27 + 1 = 124).
    // green lengths {60:2, 61:2, 256:1} (kraft 1/4+1/4+1/2 = 1) via
    // cl symbols {1:2, 2:2, 18:1}; order idx: 17@0, 18@1, 0@2, 1@3,
    // 2@4 -> numCodeLengths = 5
    val hb2 = new HandBits
    hb2.i(0x2f, 8).i(4, 14).i(0, 14).b(0).i(0, 3)
    hb2.b(0); hb2.b(0); hb2.b(0)
    hb2.b(0).i(1, 4) // numCodeLengths = 5
    hb2.i(0, 3) // cl[17] = 0
    hb2.i(1, 3) // cl[18] = 1
    hb2.i(0, 3) // cl[0]  = 0
    hb2.i(2, 3) // cl[1]  = 2
    hb2.i(2, 3) // cl[2]  = 2   -> canonical: 18->0, 1->10, 2->11
    hb2.b(0) // no max_symbol
    // lengths over 280 symbols: 60 zeros, 2 at 60, 2 at 61,
    // 194 zeros (62..255), 1 at 256, 23 zeros (257..279)
    hb2.c(0, 1).i(60 - 11, 7)  // 18: 60 zeros
    hb2.c(3, 2)                // 2 -> length 2 at sym 60
    hb2.c(3, 2)                // 2 -> length 2 at sym 61
    hb2.c(0, 1).i(138 - 11, 7) // 18: 138 zeros
    hb2.c(0, 1).i(56 - 11, 7)  // 18: 56 zeros (194 total)
    hb2.c(2, 2)                // 1 -> length 1 at sym 256
    hb2.c(0, 1).i(23 - 11, 7)  // 18: trailing 23 zeros
    // canonical green codes: len1 {256} -> 0; len2 {60, 61} -> 10, 11
    // red simple-1(3); blue simple-1(4); alpha simple-1(255)
    hb2.b(1).b(0).b(1).i(3, 8)
    hb2.b(1).b(0).b(1).i(4, 8)
    hb2.b(1).b(0).b(1).i(255, 8)
    // distance: simple-1(13); its 5 extra bits follow each use
    hb2.b(1).b(0).b(1).i(13, 8)
    // data: literals g=60,61,60,61 then length sym 256
    // (lz77Value(0) = 1) + distance extra bits 27 -> dist 124-120=4
    hb2.c(2, 2).c(3, 2).c(2, 2).c(3, 2)
    hb2.c(0, 1) // length symbol 256 -> length 1
    hb2.i(27, 5) // distance extra bits
    val s = Webp.parseWebp(hb2.riff).getOrElse(fail("no parse"))
    assert((s.width, s.height, s.nPixels) == ((5, 1, 5L)))
    // pixels: 60, 61, 60, 61, then a copy of pixel 0 (green 60)
    assert(s.sumG == 60L * 3 + 61L * 2)
    assert((s.sumR, s.sumB) == ((3L * 5, 4L * 5)))
  }

  test("hand fixture: color cache hits reproduce the cached pixel, " +
       "with 0/17/18 zero-run coding") {
    // 2×2: one literal (a=255, r=7, g=100, b=9), three cache hits.
    val argb = 0xff076409
    val cacheBits = 4
    val idx = (0x1e35a7bd * argb) >>> (32 - cacheBits) // 0..15
    val cacheSym = 256 + 24 + idx
    val alphabet = 256 + 24 + (1 << cacheBits) // 296
    // green: normal code, nonzero lengths only at {100, cacheSym}.
    // cl code over {0, 1, 17, 18}, all 2 bits -> canonical codes
    // 0->00, 1->01, 17->10, 18->11.
    val hb = new HandBits
    hb.i(0x2f, 8).i(1, 14).i(1, 14).b(0).i(0, 3) // 2×2
    hb.b(0) // no transforms
    hb.b(1).i(cacheBits, 4) // color cache on
    hb.b(0) // no meta
    hb.b(0).i(0, 4) // not simple; numCodeLengths = 4 (17,18,0,1)
    hb.i(2, 3) // cl[17] = 2
    hb.i(2, 3) // cl[18] = 2
    hb.i(2, 3) // cl[0]  = 2
    hb.i(2, 3) // cl[1]  = 2
    hb.b(0) // no max_symbol: code all 296 lengths
    def zeros(n0: Int): Unit = {
      var n = n0
      while (n >= 11) {
        val take = math.min(n, 138)
        hb.c(3, 2).i(take - 11, 7) // code 18
        n -= take
      }
      if (n >= 3) { hb.c(2, 2).i(n - 3, 3); n = 0 } // code 17
      while (n > 0) { hb.c(0, 2); n -= 1 } // plain zero lengths
    }
    zeros(100)
    hb.c(1, 2) // symbol 100 -> length 1
    zeros(cacheSym - 101)
    hb.c(1, 2) // cacheSym -> length 1
    zeros(alphabet - cacheSym - 1)
    // red/blue/alpha simple-1; distance simple-1 (unused)
    hb.b(1).b(0).b(1).i(7, 8)
    hb.b(1).b(0).b(1).i(9, 8)
    hb.b(1).b(0).b(1).i(255, 8)
    hb.b(1).b(0).b(1).i(0, 8)
    // greens {100, cacheSym} both length 1: canonical 100->0,
    // cacheSym->1. Data: literal, then three cache hits.
    hb.c(0, 1)
    (1 to 3).foreach(_ => hb.c(1, 1))
    val s = Webp.parseWebp(hb.riff).getOrElse(fail("no parse"))
    assert((s.width, s.height) == ((2, 2)))
    assert((s.sumR, s.sumG, s.sumB) == ((7L * 4, 100L * 4, 9L * 4)))
  }

  test("hand fixture: Select (mode 11) tie returns T, not L " +
       "(RFC 9649 §4.2.2 — pL < pT picks L, a tie picks T)") {
    // 2×2 with a whole-image PREDICTOR transform, mode 11. At (1,1):
    // L green 0, T green 2, TL green 1 → pred 1, pL = pT = 1 (tie).
    // Residual green 1 stored → decoded G(1,1) = T.g + 1 = 3 when the
    // tie returns T; the inverted (≤) form returns L → G = 1. The
    // writer round-trip cannot pin this: it predicts with the same
    // function it decodes with.
    val hb = new HandBits
    hb.i(0x2f, 8).i(1, 14).i(1, 14).b(0).i(0, 3) // 2×2
    hb.b(1)      // a transform follows
    hb.i(0, 2)   // PREDICTOR
    hb.i(7, 3)   // size_bits raw 7 -> 512-px blocks -> 1×1 subimage
    // subimage (no meta read for non-main): mode pixel green = 11
    hb.b(0)                    // no color cache
    hb.b(1).b(0).b(1).i(11, 8) // green simple-1(11)
    hb.b(1).b(0).b(1).i(0, 8)  // red simple-1(0)
    hb.b(1).b(0).b(1).i(0, 8)  // blue simple-1(0)
    hb.b(1).b(0).b(1).i(0, 8)  // alpha simple-1(0)
    hb.b(1).b(0).b(1).i(0, 8)  // distance simple-1(0)
    hb.b(0)      // no more transforms
    // main image: residuals A=R=B=0; greens 1, 1, 255, 1
    hb.b(0)      // no color cache
    hb.b(0)      // no meta
    hb.b(1).b(1).b(1).i(1, 8).i(255, 8) // green simple-2 {1, 255}
    hb.b(1).b(0).b(1).i(0, 8)  // red simple-1(0)
    hb.b(1).b(0).b(1).i(0, 8)  // blue simple-1(0)
    hb.b(1).b(0).b(1).i(0, 8)  // alpha simple-1(0)
    hb.b(1).b(0).b(1).i(0, 8)  // distance simple-1(0)
    hb.c(0, 1).c(0, 1).c(1, 1).c(0, 1)
    val s = Webp.parseWebp(hb.riff).getOrElse(fail("no parse"))
    assert((s.width, s.height) == ((2, 2)))
    // decoded greens: (0,0)=1, (1,0)=2, (0,1)=0, (1,1)=T.g+1=3
    assert(s.sumG == 6L, "Select tie must return T (sumG 6), not L (4)")
    assert((s.sumR, s.sumB, s.sumA) == ((0L, 0L, 255L * 4)))
  }

  test("animated WebP: VP8X/ANIM/ANMF walk, every frame fully decoded") {
    val frames = Seq(
      (8, 5, 0, formulaPx(10) _),
      (9, 6, 1, formulaPx(20) _),
      (7, 7, 2, formulaPx(30) _))
    val bytes = Webp.buildAnimatedWebp(32, 24, frames, 50)
    val (cw, chh, fs) = Webp.parseWebpFrames(bytes)
      .getOrElse(fail("no frames"))
    assert((cw, chh, fs.length) == ((32, 24, 3)))
    frames.zip(fs).foreach { case ((fw, fh, seed, px), f) =>
      assert((f.width, f.height) == ((fw, fh)))
      assert(f.durationMs == 50 + seed % 7)
      val (er, eg, eb) = expectedSums(fw, fh, px)
      assert((f.sumR, f.sumG, f.sumB) == ((er, eg, eb)), s"frame $seed")
    }
    // a still lossless image is NOT an animation
    assert(Webp.parseWebpFrames(
      Webp.buildLosslessWebp(4, 4, formulaPx(1), "plain")).isEmpty)
    // truncation/bit flips never throw
    val rnd = new scala.util.Random(83)
    (1 to 200).foreach { k =>
      val mut = bytes.clone()
      (0 to k % 3).foreach(_ =>
        mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte)
      Webp.parseWebpFrames(mut)
    }
    (1 until bytes.length by 7).foreach(n => Webp.parseWebpFrames(bytes.take(n)))
  }

  test("a VP8X-wrapped STILL lossless image decodes through the " +
       "chunk walk") {
    val plain = Webp.buildLosslessWebp(6, 4, formulaPx(8), "plain")
    val vp8lChunk = java.util.Arrays.copyOfRange(plain, 12, plain.length)
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit =
      (0 until 4).foreach(k => bos.write((v >> (8 * k)) & 0xff))
    val vp8x = Array[Byte](0, 0, 0, 0, 5, 0, 0, 3, 0, 0) // canvas 6×4
    bos.write("RIFF".getBytes)
    w32(4 + 8 + vp8x.length + vp8lChunk.length)
    bos.write("WEBP".getBytes)
    bos.write("VP8X".getBytes); w32(vp8x.length); bos.write(vp8x)
    bos.write(vp8lChunk)
    val s = Webp.parseWebp(bos.toByteArray).getOrElse(fail("no parse"))
    val (er, eg, eb) = expectedSums(6, 4, formulaPx(8))
    assert((s.width, s.height, s.sumR, s.sumG, s.sumB) ==
      ((6, 4, er, eg, eb)))
  }

  test("a lossy VP8 header with no coded partition degrades to " +
       "dimensions-only (full decode lives in WebpVp8Spec)") {
    val hdr = new java.io.ByteArrayOutputStream()
    hdr.write("RIFF".getBytes); hdr.write(Array[Byte](30, 0, 0, 0))
    hdr.write("WEBP".getBytes); hdr.write("VP8 ".getBytes)
    hdr.write(Array[Byte](10, 0, 0, 0))
    // frame tag (keyframe: bit0 = 0), start code, 14-bit w=320 h=240
    hdr.write(Array[Byte](0x00, 0x00, 0x00, 0x9d.toByte, 0x01, 0x2a,
      (320 & 0xff).toByte, (320 >> 8).toByte,
      (240 & 0xff).toByte, (240 >> 8).toByte))
    val s = Webp.parseWebp(hdr.toByteArray)
    assert(s.exists(v => v.variant == "lossy" && v.width == 320 &&
      v.height == 240 && v.nPixels == 0L))
  }

  test("hostile inputs never throw and yield None") {
    assert(Webp.parseWebp(null).isEmpty)
    assert(Webp.parseWebp("RIFFxxxxWEBP".getBytes).isEmpty)
    assert(Webp.parseWebp("not webp at all".getBytes).isEmpty)
    val good = Webp.buildLosslessWebp(9, 7, formulaPx(3), "plain")
    (1 until good.length by 3).foreach { n =>
      Webp.parseWebp(good.take(n)) // truncations
    }
    val rnd = new scala.util.Random(71)
    (1 to 400).foreach { k =>
      val mut = good.clone()
      (0 to k % 4).foreach(_ =>
        mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte)
      Webp.parseWebp(mut) // must not throw
    }
  }

  test("describeWebp and inspectMedia route the format") {
    val pay = Seq(
      (1L, Webp.buildLosslessWebp(8, 5, formulaPx(2), "plain")),
      (2L, "junk".getBytes)).toDF("id", "bytes")
    val rows = Webp.describeWebp(
        Multimodal.asMedia(pay, "id", "bytes", "image"))
      .orderBy("media_id")
      .select("media_id", "variant", "width", "height")
      .as[(Long, Option[String], Option[Int], Option[Int])].collect().toSeq
    assert(rows == Seq((1L, Some("lossless"), Some(8), Some(5)),
      (2L, None, None, None)))
    val insp = Multimodal.inspectMedia(
        Multimodal.asMedia(pay, "id", "bytes", "image"))
      .where(col("media_id") === 1L)
      .select("format", "width", "n_pixels")
      .as[(Option[String], Option[Int], Option[Long])].head()
    assert(insp == ((Some("webp"), Some(8), Some(40L))))
  }

  // --------------------------------------------------------- ALPH

  test("lossy-with-alpha: every (compression, filter) combination " +
       "round-trips the exact alpha sum") {
    def alpha(x: Int, y: Int): Int = (x * 7 + y * 13 + 11) % 256
    val w = 32; val h = 16
    val expected = (0 until h).flatMap(y => (0 until w).map(x =>
      alpha(x, y).toLong)).sum
    for (comp <- Seq(0, 1); filt <- Seq(0, 1, 2, 3)) {
      val b = Webp.buildLossyWebpAlpha(2, 1,
        (_, _) => (90, 120, 130), "dc", alpha, comp, filt)
      val st = Webp.parseWebp(b).get
      assert(st.variant == "lossy" && st.width == 32 && st.height == 16)
      assert(st.sumA == expected, s"comp=$comp filt=$filt")
    }
  }

  test("hand-computed horizontal filter: residuals accumulate left " +
       "to right, rows after the first predict col 0 from above") {
    // 2x2 plane (w=2): values a=[10, 12, 9, 9]
    // forward (filter 1): r00=10-0=10, r01=12-10=2,
    //   r10=9-10=-1 (pred above), r11=9-9=0
    // decode must invert to the original sum 40. Pin via decodeAlph
    // on hand bytes (raw compression).
    val res = Array[Byte](10, 2, -1, 0)
    val payload = Array[Byte]((1 << 2).toByte) ++ res // comp 0, filter 1
    val a = Webp.decodeAlph(payload, 0, payload.length, 2, 2).get
    assert(a.toSeq == Seq(10, 12, 9, 9))
  }

  test("gradient filter clips the predictor into [0, 255]") {
    // plane 2x2: [0, 255, 255, v] -> at (1,1) pred =
    // clip(255 + 255 - 0) = 255
    val orig = Array(0, 255, 255, 200)
    val b = Webp.buildLossyWebpAlpha(1, 1, (_, _) => (128, 128, 128),
      "dc", (x, y) => if (x < 2 && y < 2) orig(y * 2 + x) else 0, 0, 3)
    val st = Webp.parseWebp(b).get
    // full 16x16 plane: the four corner values plus zeros
    assert(st.sumA == orig.map(_.toLong).sum)
  }

  test("corrupt ALPH yields a loud zero alpha sum, not opaque; " +
       "alpha-less lossy stays opaque") {
    val good = Webp.buildLossyWebpAlpha(1, 1, (_, _) => (90, 120, 130),
      "dc", (x, y) => 255, 1, 0)
    // truncate the ALPH chunk body: find "ALPH" and lie about VP8L bits
    var i = 12
    var alphAt = -1
    while (alphAt < 0 && i + 8 < good.length) {
      if (good(i) == 'A' && good(i + 1) == 'L' && good(i + 2) == 'P' &&
          good(i + 3) == 'H') alphAt = i
      i += 1
    }
    val bad = good.clone()
    bad(alphAt + 9) = 0x55 // corrupt the headerless stream
    val st = Webp.parseWebp(bad)
    assert(st.isEmpty || st.get.sumA == 0L ||
      st.get.sumA == 255L * 16 * 16) // never throws; zero or re-synced
    val plain = Webp.buildLossyWebp(1, 1, (_, _) => (90, 120, 130), "dc")
    assert(Webp.parseWebp(plain).get.sumA == 255L * 16 * 16)
  }

  test("animated frames carry per-frame ALPH alpha: each frame's " +
       "(compression, filter) pair round-trips its sum; VP8L frames " +
       "report their own alpha; alpha-less lossy frames are opaque") {
    def alpha(k: Int)(x: Int, y: Int): Int = (k * 31 + x * 3 + y * 7) % 256
    val frames = (0 until 4).map(k =>
      (1, 1, (_: Int, _: Int) => (90, 120, 130),
        alpha(k) _, k % 2, k % 4))
    val b = Webp.buildAnimatedWebpAlpha(16, 16, frames, 10)
    val (cw, ch, fs) = Webp.parseWebpFrames(b).get
    assert(cw == 16 && ch == 16 && fs.length == 4)
    fs.zipWithIndex.foreach { case (f, k) =>
      val expected = (0 until 16).flatMap(y => (0 until 16).map(x =>
        alpha(k)(x, y).toLong)).sum
      assert(f.sumA == expected, s"frame $k")
      assert(f.durationMs == 10 + k)
    }
    // the plain animated writer (VP8L frames, opaque by construction)
    val plain = Webp.buildAnimatedWebp(30, 20,
      Seq((8, 5, 0, (_: Int, _: Int) => (1, 2, 3))), 40)
    val pf = Webp.parseWebpFrames(plain).get._3.head
    assert(pf.sumA == 255L * 8 * 5)
  }
}
