package graft.sources

/** Differential pins for the VP8 (lossy WebP) keyframe decoder:
  * every fixture under src/test/resources/vp8 was produced by the
  * system reference encoder (libwebp — 8 of the 20 with the in-loop
  * filter ON: strengths 30-100, sharpness 0-7, simple type, 4
  * segments; [[Vp8.decode]] applies the full deblocking filter) and
  * decoded by the reference
  * decoder; [[Vp8.decode]] must reproduce the exact Y/U/V planes
  * (CRC32 over y ++ u ++ v, plus per-plane sums). The fixture set
  * covers flat / formula / random / gradient content, qualities
  * 20-95, odd dimensions, 4 segments, 4 token partitions,
  * sns_strength 0, and method 0 (i4x4-heavy) — exercising every
  * intra predictor, token category, segment quantizer, and partition
  * interleave. Regenerate with tools/gen_vp8_fixtures.py. */
class WebpVp8Spec extends graft.SparkSpec {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/vp8/$name")
    require(in != null, s"missing resource $name")
    try in.readAllBytes() finally in.close()
  }

  private case class Fx(name: String, width: Int, height: Int,
                        ySum: Long, uSum: Long, vSum: Long, crc: Long)

  private def manifest: Seq[Fx] = {
    val txt = new String(resource("manifest.json"), "UTF-8")
    // tiny flat-JSON pull: the manifest is a list of flat objects
    val obj = "\\{[^}]*\\}".r
    obj.findAllIn(txt).map { o =>
      def s(k: String) =
        s""""$k":\\s*"([^"]*)"""".r.findFirstMatchIn(o).get.group(1)
      def n(k: String) =
        s""""$k":\\s*(\\d+)""".r.findFirstMatchIn(o).get.group(1).toLong
      Fx(s("name"), n("width").toInt, n("height").toInt,
        n("y_sum"), n("u_sum"), n("v_sum"), n("crc32"))
    }.toSeq
  }

  test("reference-encoded VP8 streams decode to the reference " +
       "decoder's exact YUV planes (sums + CRC32)") {
    val fxs = manifest
    assert(fxs.size >= 12)
    fxs.foreach { fx =>
      val bytes = resource(fx.name + ".webp")
      // container: RIFF WEBP 'VP8 ' chunk at 12
      assert(new String(bytes.slice(12, 16), "ISO-8859-1") == "VP8 ", fx.name)
      val end = 20 + ((bytes(16) & 0xff) | ((bytes(17) & 0xff) << 8) |
        ((bytes(18) & 0xff) << 16))
      val f = Vp8.decode(bytes, 20, math.min(end, bytes.length))
        .getOrElse(fail(s"${fx.name}: decode failed"))
      assert((f.width, f.height) == ((fx.width, fx.height)), fx.name)
      def sum(a: Array[Byte]): Long = { var s = 0L; a.foreach(b => s += b & 0xff); s }
      assert(sum(f.y) == fx.ySum, s"${fx.name}: y sum")
      assert(sum(f.u) == fx.uSum, s"${fx.name}: u sum")
      assert(sum(f.v) == fx.vSum, s"${fx.name}: v sum")
      val crc = new java.util.zip.CRC32()
      crc.update(f.y); crc.update(f.u); crc.update(f.v)
      assert(crc.getValue == fx.crc, s"${fx.name}: plane crc")
    }
  }

  test("buildLossyWebp round-trips every variant exactly (MB-flat " +
       "DC-only residuals at a dividing quantizer)") {
    for (variant <- Seq("dc", "v", "h", "tm", "bpred");
         (mw, mh) <- Seq((1, 1), (3, 2), (4, 3))) {
      def yuv(mx: Int, my: Int) =
        ((7 * mx * 31 + my * 17 + 11) % 256, (5 + mx * 11 + my * 23) % 256,
          (3 + mx * 13 + my * 29) % 256)
      val bytes = Vp8.buildLossyWebp(mw, mh, yuv, variant)
      val end = 20 + ((bytes(16) & 0xff) | ((bytes(17) & 0xff) << 8) |
        ((bytes(18) & 0xff) << 16))
      val f = Vp8.decode(bytes, 20, math.min(end, bytes.length))
        .getOrElse(fail(s"$variant-${mw}x$mh: no decode"))
      assert((f.width, f.height) == ((mw * 16, mh * 16)))
      var bad = 0
      for (py <- 0 until f.height; px <- 0 until f.width)
        if ((f.y(py * f.width + px) & 0xff) != yuv(px / 16, py / 16)._1) bad += 1
      val cw = (f.width + 1) / 2
      for (py <- 0 until (f.height + 1) / 2; px <- 0 until cw) {
        if ((f.u(py * cw + px) & 0xff) != yuv(px / 8, py / 8)._2) bad += 1
        if ((f.v(py * cw + px) & 0xff) != yuv(px / 8, py / 8)._3) bad += 1
      }
      assert(bad == 0, s"$variant-${mw}x$mh: $bad wrong pixels")
    }
  }

  test("parseWebp decodes lossy stills to pixel stats; describeWebpLossy " +
       "exposes the YUV plane sums") {
    import spark.implicits._
    def yuv(mx: Int, my: Int) = ((40 + mx * 9 + my * 5) % 256,
      (100 + mx * 3) % 256, (90 + my * 7) % 256)
    val bytes = Vp8.buildLossyWebp(3, 2, yuv, "dc")
    val s = Webp.parseWebp(bytes).getOrElse(fail("no parse"))
    assert(s.variant == "lossy" && s.width == 48 && s.height == 32)
    assert(s.nPixels == 48L * 32 && s.sumA == 255L * 48 * 32)
    // RGB sums replay the documented integer BT.601 conversion
    def cl(v: Int) = math.max(0, math.min(255, v))
    var er = 0L; var eg = 0L; var eb = 0L
    for (py <- 0 until 32; px <- 0 until 48) {
      val (y0, u0, v0) = yuv(px / 16, py / 16)
      val c = y0 - 16; val d = u0 - 128; val e = v0 - 128
      er += cl((298 * c + 409 * e + 128) >> 8)
      eg += cl((298 * c - 100 * d - 208 * e + 128) >> 8)
      eb += cl((298 * c + 516 * d + 128) >> 8)
    }
    assert((s.sumR, s.sumG, s.sumB) == ((er, eg, eb)))
    // the YUV-contract frame surface
    val rows = Webp.describeWebpLossy(
        Multimodal.asMedia(Seq((1L, bytes), (2L, "junk".getBytes))
          .toDF("id", "b"), "id", "b", "image"))
      .orderBy("media_id")
      .select("media_id", "width", "n_pixels", "y_sum")
      .as[(Long, Option[Int], Option[Long], Option[Long])].collect().toSeq
    var ey = 0L
    for (py <- 0 until 32; px <- 0 until 48) ey += yuv(px / 16, py / 16)._1
    assert(rows == Seq((1L, Some(48), Some(48L * 32), Some(ey)),
      (2L, None, None, None)))
  }

  test("hostile VP8 payloads never throw: truncations and bit flips") {
    val bytes = resource("random_64x48_q85.webp")
    (1 until bytes.length by 3).foreach { n =>
      Vp8.decode(bytes.take(n), 20, n)
    }
    val rnd = new scala.util.Random(97)
    (1 to 300).foreach { k =>
      val mut = bytes.clone()
      (0 to k % 4).foreach(_ =>
        mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte)
      Vp8.decode(mut, 20, mut.length)
    }
  }
}
