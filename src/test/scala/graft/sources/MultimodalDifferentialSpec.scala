package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Differential pins for the codec-free decode tiers against the
  * JDK's OWN independent decoders — javax.sound.sampled for WAV,
  * javax.imageio for BMP and GIF. The q233/q234/q235 oracles prove
  * formula→stats agreement with DuckDB; these prove the BYTE-level
  * container reading agrees with a second, unrelated implementation
  * on randomized payloads (seeded). */
class MultimodalDifferentialSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(1234)

  // ---- WAV vs javax.sound.sampled --------------------------------

  private def randomWav(): (Array[Byte], Int, Int, Int, Int) = {
    val rate = 4000 + rnd.nextInt(44100)
    val ch = 1 + rnd.nextInt(2)
    val bits = if (rnd.nextBoolean()) 16 else 8
    val frames = 1 + rnd.nextInt(200)
    val blockAlign = bits / 8 * ch
    val b = java.nio.ByteBuffer.allocate(44 + frames * blockAlign)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + frames * blockAlign)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(ch.toShort).putInt(rate).putInt(rate * blockAlign)
      .putShort(blockAlign.toShort).putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(frames * blockAlign)
    (0 until frames * ch).foreach { _ =>
      if (bits == 16) b.putShort(rnd.nextInt(65536).toShort)
      else b.put(rnd.nextInt(256).toByte)
    }
    (b.array(), rate, ch, bits, frames)
  }

  test("parseWavPcm agrees with javax.sound on format fields AND sample values") {
    (1 to 25).foreach { _ =>
      val (bytes, rate, ch, bits, frames) = randomWav()
      val got = Multimodal.parseWavPcm(bytes).get
      // independent decoder: format header
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      assert(fmt.getSampleRate.toInt == rate && got.sampleRate == rate)
      assert(fmt.getChannels == ch && got.channels == ch)
      assert(fmt.getSampleSizeInBits == bits && got.bitsPerSample == bits)
      assert(ais.getFrameLength == frames && got.nFrames == frames)
      // independent sample decode: recompute peak/rms from the raw
      // frames javax.sound hands back
      val raw = ais.readAllBytes()
      val bb = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val full = (1L << (bits - 1)).toDouble
      var peak = 0.0; var sumSq = 0.0; var n = 0L
      while (bb.hasRemaining) {
        val v = if (bits == 16) bb.getShort.toDouble
                else ((bb.get & 0xff) - 128).toDouble
        val x = v / full
        peak = math.max(peak, math.abs(x)); sumSq += x * x; n += 1
      }
      val rms = if (n > 0) math.sqrt(sumSq / n) else 0.0
      assert(math.abs(got.peak - peak) < 1e-12, s"peak ${got.peak} vs $peak")
      assert(math.abs(got.rms - rms) < 1e-12, s"rms ${got.rms} vs $rms")
    }
  }

  // ---- perceptual dHash ------------------------------------------

  test("imageDHash is brightness-invariant and locally sensitive") {
    val w = 27; val h = 24 // non-multiple dims: floor-boundary blocks differ in size
    def grid(f: (Int, Int) => Int): Array[Int] =
      Array.tabulate(h * w) { i =>
        val v = f(i % w, i / w) & 0xff
        (v << 16) | (v << 8) | v
      }
    val base = grid((x, y) => (x * 31 + y * 47) % 200)
    val hash = Multimodal.imageDHash(w, h, base).get
    // uniform brightness scaling preserves every mean comparison
    val brighter = base.map { p =>
      val v = math.min(255, ((p & 0xff) * 5) / 4)
      (v << 16) | (v << 8) | v
    }
    assert(Multimodal.imageDHash(w, h, brighter).get == hash,
      "brightness scaling must not move the hash")
    // flipping one block's content flips at most its two comparisons
    val tweaked = base.clone()
    (0 until h).foreach { y => (0 until w).foreach { x =>
      if (x >= 9 && x < 12 && y >= 6 && y < 9)
        tweaked(y * w + x) = 0xffffff } }
    val ht = Multimodal.imageDHash(w, h, tweaked).get
    val hamming = java.lang.Long.bitCount(hash ^ ht)
    assert(hamming >= 1 && hamming <= 4, s"local edit moved $hamming bits")
    // tiny images and short grids refuse
    assert(Multimodal.imageDHash(8, 8, new Array[Int](64)).isEmpty)
    assert(Multimodal.imageDHash(9, 8, new Array[Int](10)).isEmpty)
  }

  // ---- WebP header + ICO decode ----------------------------------

  test("parseImageHeader reads WebP dims from VP8, VP8L and VP8X chunks") {
    def riff(tag: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(20 + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(12 + payload.length).put("WEBP".getBytes)
        .put(tag.getBytes).putInt(payload.length).put(payload).array()
    }
    // VP8 lossy: 3-byte frame tag, 9d 01 2a sync, 14-bit LE dims
    val vp8 = riff("VP8 ", Array[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2a,
      (320 & 0xff).toByte, (320 >> 8).toByte, (240 & 0xff).toByte, (240 >> 8).toByte))
    assert(Multimodal.parseImageHeader(vp8).contains(("webp", 320, 240)))
    // VP8L lossless: 0x2f then packed (w-1):14 | (h-1):14
    val dims = (99L) | (49L << 14) // 100x50
    val vp8l = riff("VP8L", Array[Byte](0x2f,
      (dims & 0xff).toByte, ((dims >> 8) & 0xff).toByte,
      ((dims >> 16) & 0xff).toByte, ((dims >> 24) & 0xff).toByte))
    assert(Multimodal.parseImageHeader(vp8l).contains(("webp", 100, 50)))
    // VP8X extended: flags(4) then 24-bit canvas minus one
    val vp8x = riff("VP8X", Array[Byte](0, 0, 0, 0,
      (799 & 0xff).toByte, (799 >> 8).toByte, 0, (599 & 0xff).toByte,
      (599 >> 8).toByte, 0))
    assert(Multimodal.parseImageHeader(vp8x).contains(("webp", 800, 600)))
    assert(Multimodal.parseImageHeader(
      "RIFF0000WAVEfmt ".getBytes("US-ASCII")).isEmpty)
  }

  /** Hand-built ICO with one DIB entry (bottom-up, padded rows). */
  private def icoDib(w: Int, h: Int, bpp: Int,
                     palette: Seq[(Int, Int, Int)],
                     pix: (Int, Int) => Int): Array[Byte] = {
    val rowBytes = ((w * bpp + 31) / 32) * 4
    val maskRow = ((w + 31) / 32) * 4
    val imgSize = 40 + 4 * palette.length + rowBytes * h + maskRow * h
    val bb = java.nio.ByteBuffer.allocate(6 + 16 + imgSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putShort(0).putShort(1).putShort(1) // icon, 1 entry
    bb.put(w.toByte).put(h.toByte).put(palette.length.toByte).put(0.toByte)
      .putShort(1).putShort(bpp.toShort).putInt(imgSize).putInt(6 + 16)
    bb.putInt(40).putInt(w).putInt(2 * h).putShort(1).putShort(bpp.toShort)
      .putInt(0).putInt(0).putInt(0).putInt(0).putInt(palette.length).putInt(0)
    palette.foreach { case (r, g, b) =>
      bb.put(b.toByte).put(g.toByte).put(r.toByte).put(0.toByte) }
    (0 until h).foreach { rowFromBottom =>
      val y = h - 1 - rowFromBottom
      val row = new Array[Byte](rowBytes)
      (0 until w).foreach { x =>
        val v = pix(x, y)
        bpp match {
          case 32 =>
            row(4 * x) = v.toByte; row(4 * x + 1) = (v >> 8).toByte
            row(4 * x + 2) = (v >> 16).toByte; row(4 * x + 3) = (v >>> 24).toByte
          case 24 =>
            row(3 * x) = v.toByte; row(3 * x + 1) = (v >> 8).toByte
            row(3 * x + 2) = (v >> 16).toByte
          case _ =>
            val perByte = 8 / bpp
            val shift = 8 - bpp - (x % perByte) * bpp
            row(x / perByte) = (row(x / perByte) | (v << shift)).toByte
        }
      }
      bb.put(row)
    }
    (0 until h).foreach(_ => bb.put(new Array[Byte](maskRow))) // AND mask
    bb.array()
  }

  test("parseIcoPixels decodes 32bpp, palette-4bpp and PNG-embedded icons") {
    // 32bpp BGRA with varying alpha (skipped)
    val got32 = Multimodal.parseIcoPixels(icoDib(5, 4, 32, Nil, (x, y) =>
      ((x * 50 + y) << 24) | ((x * 7 + y * 3) << 16) | ((x + y * 11) << 8) | (x * 13))).get
    assert(got32.inner == "dib" && got32.width == 5 && got32.height == 4 &&
      got32.bpp == 32 && got32.nPixels == 20)
    var wr = 0L; var wg = 0L; var wb = 0L
    (0 until 4).foreach { y => (0 until 5).foreach { x =>
      wr += x * 7 + y * 3; wg += x + y * 11; wb += x * 13 } }
    assert((got32.sumR, got32.sumG, got32.sumB) == ((wr, wg, wb)))
    // 4bpp through palette, odd width (slack bits)
    val pal = Seq((10, 20, 30), (200, 100, 50), (1, 2, 3), (250, 251, 252))
    val got4 = Multimodal.parseIcoPixels(icoDib(7, 3, 4, pal ++ Seq.fill(12)((0, 0, 0)),
      (x, y) => (x + y) % 4)).get
    assert(got4.bpp == 4 && got4.nPixels == 21)
    var pr = 0L
    (0 until 3).foreach { y => (0 until 7).foreach { x => pr += pal((x + y) % 4)._1 } }
    assert(got4.sumR == pr)
    // PNG-embedded: delegates to the pinned PNG decoder
    val png = pngWithFilter(2, Seq.tabulate(3, 4)((y, x) => (x * 60, y * 90, x + y)))
    val bb = java.nio.ByteBuffer.allocate(6 + 16 + png.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putShort(0).putShort(1).putShort(1)
    bb.put(4.toByte).put(3.toByte).put(0.toByte).put(0.toByte)
      .putShort(1).putShort(32).putInt(png.length).putInt(6 + 16)
    bb.put(png)
    val gotP = Multimodal.parseIcoPixels(bb.array()).get
    val direct = Multimodal.parsePngPixels(png).get
    assert(gotP.inner == "png" && gotP.width == 4 && gotP.height == 3)
    assert((gotP.sumR, gotP.sumG, gotP.sumB) ==
      ((direct.sumR, direct.sumG, direct.sumB)))
    // hostile: cursor type, truncation, garbage — None / clamp, no throw
    val cur = icoDib(5, 4, 32, Nil, (_, _) => 0)
    cur(2) = 2 // type = cursor
    assert(Multimodal.parseIcoPixels(cur).isEmpty)
    (6 until 60 by 7).foreach(cut =>
      Multimodal.parseIcoPixels(icoDib(5, 4, 32, Nil, (_, _) => 7).take(cut)))
    assert(Multimodal.parseIcoPixels("not an icon".getBytes).isEmpty)
    assert(Multimodal.parseIcoPixels(null).isEmpty)
  }

  // ---- AU / AIFF / G.711 vs javax.sound --------------------------

  test("ulaw/alaw decode matches javax.sound on ALL 256 codes") {
    Seq((javax.sound.sampled.AudioFormat.Encoding.ULAW, 1),
        (javax.sound.sampled.AudioFormat.Encoding.ALAW, 27)).foreach {
      case (enc, code) =>
        // AU file holding every byte value once
        val bos = new java.io.ByteArrayOutputStream()
        val d = new java.io.DataOutputStream(bos)
        d.writeBytes(".snd"); d.writeInt(24); d.writeInt(256)
        d.writeInt(code); d.writeInt(8000); d.writeInt(1)
        (0 until 256).foreach(d.writeByte)
        val bytes = bos.toByteArray
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val pcm = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          8000, 16, 1, 2, 8000, true)
        val conv = javax.sound.sampled.AudioSystem.getAudioInputStream(pcm, ais)
        val out = conv.readAllBytes()
        val javaVals = Array.tabulate(256)(i =>
          (((out(2 * i) & 0xff) << 8) | (out(2 * i + 1) & 0xff)).toShort.toInt)
        val mine = Array.tabulate(256)(b =>
          if (code == 1) Multimodal.ulawToLinear16(b) else Multimodal.alawToLinear16(b))
        assert(mine.sameElements(javaVals),
          s"$enc: first diff at ${mine.zip(javaVals).indexWhere(p => p._1 != p._2)}")
        // and the container stats agree with a direct fold
        val st = Multimodal.parseAu(bytes).get
        assert(st.format == (if (code == 1) "au_ulaw" else "au_alaw"))
        assert(st.nFrames == 256 && st.sampleRate == 8000)
        assert(st.peakRaw == javaVals.map(v => math.abs(v.toLong)).max)
        assert(st.sumSq == javaVals.map(v => v.toLong * v).sum)
    }
  }

  test("parseAu/parseAiff decode javax.sound-WRITTEN files exactly (incl. 80-bit rate)") {
    Seq(8000f, 22050f, 44100f).foreach { rate =>
      val n = 50 + rnd.nextInt(200)
      val ch = 1 + rnd.nextInt(2)
      val samples = Array.fill(n * ch)(rnd.nextInt(65536) - 32768)
      val pcmBytes = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (v, i) =>
        pcmBytes(2 * i) = (v >> 8).toByte; pcmBytes(2 * i + 1) = v.toByte }
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        rate, 16, ch, 2 * ch, rate, true)
      def write(t: javax.sound.sampled.AudioFileFormat.Type): Array[Byte] = {
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcmBytes), fmt, n)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais, t, bos)
        bos.toByteArray
      }
      val wantPeak = samples.map(v => math.abs(v.toLong)).max
      val wantSq = samples.map(v => v.toLong * v).sum
      val au = Multimodal.parseAu(
        write(javax.sound.sampled.AudioFileFormat.Type.AU)).get
      assert(au.format == "au_pcm16" && au.sampleRate == rate.toInt &&
        au.channels == ch && au.nFrames == n)
      assert(au.peakRaw == wantPeak && au.sumSq == wantSq, s"AU rate=$rate")
      val aiff = Multimodal.parseAiff(
        write(javax.sound.sampled.AudioFileFormat.Type.AIFF)).get
      assert(aiff.format == "aiff_pcm16" && aiff.sampleRate == rate.toInt,
        s"AIFF 80-bit rate parse: got ${aiff.sampleRate} want ${rate.toInt}")
      assert(aiff.channels == ch && aiff.nFrames == n)
      assert(aiff.peakRaw == wantPeak && aiff.sumSq == wantSq, s"AIFF rate=$rate")
    }
  }

  test("parseAu/parseAiff clamp truncation and survive hostile bytes") {
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(bos)
    d.writeBytes(".snd"); d.writeInt(24); d.writeInt(0xffffffff) // unknown size
    d.writeInt(3); d.writeInt(8000); d.writeInt(1)
    (0 until 100).foreach(i => d.writeShort(i * 321 - 16000))
    val au = bos.toByteArray
    assert(Multimodal.parseAu(au).get.nFrames == 100) // unknown size clamps to bytes
    assert(Multimodal.parseAu(au.take(24 + 41)).get.nFrames == 20) // partial frame drops
    (1 to 200).foreach { k =>
      val c = au.clone()
      (0 to k % 3).foreach { _ => c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte }
      Multimodal.parseAu(c); Multimodal.parseAiff(c) // never a throw
    }
    assert(Multimodal.parseAu("not audio".getBytes).isEmpty)
    assert(Multimodal.parseAiff("FORMxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.parseAu(null).isEmpty && Multimodal.parseAiff(null).isEmpty)
  }

  // ---- BMP vs javax.imageio --------------------------------------

  private def randomBmp(): Array[Byte] = {
    val w = 1 + rnd.nextInt(9); val h = 1 + rnd.nextInt(7)
    val topDown = rnd.nextBoolean()
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val b = java.nio.ByteBuffer.allocate(54 + rowBytes * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + rowBytes * h)
      .putShort(0).putShort(0).putInt(54)
    b.putInt(40).putInt(w).putInt(if (topDown) -h else h).putShort(1).putShort(24)
      .putInt(0).putInt(rowBytes * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    (0 until h).foreach { _ =>
      (0 until w * 3).foreach(_ => b.put(rnd.nextInt(256).toByte))
      (w * 3 until rowBytes).foreach(_ => b.put(0.toByte))
    }
    b.array()
  }

  test("parseBmpPixels agrees with javax.imageio on dimensions and channel sums") {
    (1 to 25).foreach { _ =>
      val bytes = randomBmp()
      val got = Multimodal.parseBmpPixels(bytes).get
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, "ImageIO rejected a BMP our writer produced")
      assert(img.getWidth == got.width && img.getHeight == got.height)
      var sr = 0L; var sg = 0L; var sb = 0L
      (0 until img.getHeight).foreach { y =>
        (0 until img.getWidth).foreach { x =>
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        }
      }
      assert(got.nPixels == img.getWidth.toLong * img.getHeight)
      assert(got.sumR == sr && got.sumG == sg && got.sumB == sb,
        s"sums (${got.sumR},${got.sumG},${got.sumB}) vs ($sr,$sg,$sb)")
    }
  }

  // ---- PNG vs javax.imageio --------------------------------------

  test("parsePngPixels agrees with javax.imageio on ImageIO-ENCODED PNGs") {
    // ImageIO's own PNG encoder picks real per-row prediction filters
    // — decoding its output exercises zlib + unfiltering on bytes we
    // did not craft ourselves
    (1 to 15).foreach { _ =>
      val w = 1 + rnd.nextInt(12); val h = 1 + rnd.nextInt(9)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var sr = 0L; var sg = 0L; var sb = 0L
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          val (r, g, b) = (rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256))
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          sr += r; sg += g; sb += b
        }
      }
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", baos))
      val got = Multimodal.parsePngPixels(baos.toByteArray).get
      assert(got.width == w && got.height == h && got.nPixels == w.toLong * h)
      assert(got.sumR == sr && got.sumG == sg && got.sumB == sb,
        s"${w}x$h: (${got.sumR},${got.sumG},${got.sumB}) vs ($sr,$sg,$sb)")
    }
  }

  /** Hand-built PNG with ONE chosen filter tag on every scanline. */
  private def pngWithFilter(filter: Int, px: Seq[Seq[(Int, Int, Int)]]): Array[Byte] = {
    val h = px.length; val w = px.head.length
    // raw filtered scanlines per the spec (inverse of the decoder)
    val stride = 3 * w
    val raw = new Array[Byte](h * (1 + stride))
    val prev = new Array[Int](stride)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    (0 until h).foreach { y =>
      val base = y * (1 + stride)
      raw(base) = filter.toByte
      val cur = new Array[Int](stride)
      (0 until stride).foreach { x =>
        val (r, g, b) = px(y)(x / 3)
        cur(x) = Seq(r, g, b)(x % 3)
        val a = if (x >= 3) cur(x - 3) else 0
        val up = prev(x)
        val c = if (x >= 3) prev(x - 3) else 0
        val pred = filter match {
          case 0 => 0
          case 1 => a
          case 2 => up
          case 3 => (a + up) / 2
          case 4 => paeth(a, up, c)
        }
        raw(base + 1 + x) = ((cur(x) - pred) & 0xff).toByte
      }
      System.arraycopy(cur, 0, prev, 0, stride)
    }
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length + 64)
      val n = d.deflate(buf); d.end()
      buf.take(n)
    }
    def chunk(typ: String, payload: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + payload.length)
      out.putInt(payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(payload)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", deflated) ++
      chunk("IEND", Array.emptyByteArray)
  }

  test("parsePngPixels unfilters every PNG filter type exactly") {
    val px = Seq(
      Seq((10, 200, 30), (250, 1, 99), (128, 128, 128)),
      Seq((0, 255, 7), (77, 60, 200), (5, 250, 250)))
    val want = (px.flatten.map(_._1).sum.toLong,
      px.flatten.map(_._2).sum.toLong, px.flatten.map(_._3).sum.toLong)
    (0 to 4).foreach { f =>
      val st = Multimodal.parsePngPixels(pngWithFilter(f, px)).get
      assert((st.sumR, st.sumG, st.sumB) == want, s"filter $f")
      assert(st.width == 3 && st.height == 2)
      // cross-check the fixture itself with ImageIO
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(pngWithFilter(f, px)))
      assert(img != null && img.getWidth == 3, s"ImageIO rejected filter-$f fixture")
    }
  }

  /** Hand-built palette PNG: PLTE of `palette` RGB triples, indices
    * packed MSB-first at `depth` bits, filter-0 rows. */
  private def pngPaletted(depth: Int, palette: Seq[(Int, Int, Int)],
                          idx: Seq[Seq[Int]]): Array[Byte] = {
    val h = idx.length; val w = idx.head.length
    val stride = (w * depth + 7) / 8
    val raw = new Array[Byte](h * (1 + stride))
    val perByte = 8 / depth
    (0 until h).foreach { y =>
      val base = y * (1 + stride)
      raw(base) = 0
      (0 until w).foreach { x =>
        val shift = 8 - depth - (x % perByte) * depth
        raw(base + 1 + x / perByte) =
          (raw(base + 1 + x / perByte) | (idx(y)(x) << shift)).toByte
      }
    }
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length + 64)
      val n = d.deflate(buf); d.end()
      buf.take(n)
    }
    def chunk(typ: String, payload: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + payload.length)
      out.putInt(payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(payload)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(depth.toByte).put(3.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val plte = palette.flatMap { case (r, g, b) =>
      Seq(r.toByte, g.toByte, b.toByte) }.toArray
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    sig ++ chunk("IHDR", ihdr) ++ chunk("PLTE", plte) ++
      chunk("IDAT", deflated) ++ chunk("IEND", Array.emptyByteArray)
  }

  test("parsePngPixels decodes palette PNGs at every depth exactly (vs ImageIO)") {
    Seq(1, 2, 4, 8).foreach { depth =>
      val n = 1 << depth
      val palette = Seq.tabulate(n)(i => ((i * 37) % 256, (i * 59) % 256, (i * 83) % 256))
      val w = 9; val h = 5 // odd width: sub-byte rows have slack bits
      val idx = Seq.tabulate(h, w)((y, x) => (x * 3 + y * 5) % n)
      val bytes = pngPaletted(depth, palette, idx)
      val got = Multimodal.parsePngPixels(bytes).get
      assert(got.width == w && got.height == h && got.bitDepth == depth)
      val want = idx.flatten.map(palette)
      assert(got.sumR == want.map(_._1.toLong).sum, s"depth $depth R")
      assert(got.sumG == want.map(_._2.toLong).sum, s"depth $depth G")
      assert(got.sumB == want.map(_._3.toLong).sum, s"depth $depth B")
      // the JDK decoder accepts the same bytes and agrees per pixel
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected depth-$depth palette fixture")
      var sr = 0L
      (0 until h).foreach { y => (0 until w).foreach { x =>
        sr += (img.getRGB(x, y) >> 16) & 0xff } }
      assert(sr == got.sumR, s"depth $depth vs ImageIO")
    }
  }

  test("parsePngPixels decodes ImageIO-ENCODED indexed PNGs (third-party palette bytes)") {
    (1 to 10).foreach { _ =>
      val w = 1 + rnd.nextInt(14); val h = 1 + rnd.nextInt(9)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
      (0 until h).foreach { y => (0 until w).foreach { x =>
        img.setRGB(x, y, rnd.nextInt(1 << 24)) } }
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", baos))
      val bytes = baos.toByteArray
      val got = Multimodal.parsePngPixels(bytes).get
      // ImageIO quantized to ITS palette on write; compare against its
      // own read-back of the same bytes
      val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var sr = 0L; var sg = 0L; var sb = 0L
      (0 until h).foreach { y => (0 until w).foreach { x =>
        val p = dec.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff } }
      assert(got.width == w && got.height == h)
      assert(got.sumR == sr && got.sumG == sg && got.sumB == sb,
        s"${w}x$h depth ${got.bitDepth}: (${got.sumR},${got.sumG},${got.sumB}) vs ($sr,$sg,$sb)")
    }
  }

  test("parsePngPixels decodes RGBA / gray / 16-bit ImageIO PNGs (alpha skipped, top byte)") {
    // RGBA (color type 6): alpha varies, sums ignore it
    locally {
      val w = 11; val h = 7
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_ARGB)
      var sr = 0L; var sg = 0L; var sb = 0L
      (0 until h).foreach { y => (0 until w).foreach { x =>
        val (a, r, g, b) =
          (rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256))
        img.setRGB(x, y, (a << 24) | (r << 16) | (g << 8) | b)
        sr += r; sg += g; sb += b } }
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", baos))
      val got = Multimodal.parsePngPixels(baos.toByteArray).get
      assert(got.width == w && got.height == h)
      assert(got.sumR == sr && got.sumG == sg && got.sumB == sb,
        s"rgba: (${got.sumR},${got.sumG},${got.sumB}) vs ($sr,$sg,$sb)")
    }
    // grayscale 8-bit (color type 0)
    locally {
      val w = 9; val h = 6
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      var s = 0L
      (0 until h).foreach { y => (0 until w).foreach { x =>
        val g = rnd.nextInt(256)
        img.getRaster.setSample(x, y, 0, g); s += g } }
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", baos))
      val got = Multimodal.parsePngPixels(baos.toByteArray).get
      assert(got.bitDepth == 8 && got.sumR == s && got.sumG == s && got.sumB == s)
    }
    // grayscale 16-bit: our contract is the TOP byte of each sample
    locally {
      val w = 8; val h = 5
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
      var s = 0L
      (0 until h).foreach { y => (0 until w).foreach { x =>
        val g = rnd.nextInt(65536)
        img.getRaster.setSample(x, y, 0, g); s += g >> 8 } }
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", baos))
      val got = Multimodal.parsePngPixels(baos.toByteArray).get
      assert(got.bitDepth == 16, s"expected a 16-bit PNG, got depth ${got.bitDepth}")
      assert(got.sumR == s && got.sumG == s && got.sumB == s,
        s"gray16: ${got.sumR} vs $s")
    }
  }

  /** Hand-built PNG of arbitrary color type/depth: filter-0 rows over
    * caller-provided raw sample bytes. */
  private def pngRaw(colorType: Int, depth: Int, w: Int, h: Int,
                     rows: Seq[Array[Byte]]): Array[Byte] = {
    val stride = rows.head.length
    val raw = new Array[Byte](h * (1 + stride))
    (0 until h).foreach { y =>
      raw(y * (1 + stride)) = 0
      System.arraycopy(rows(y), 0, raw, y * (1 + stride) + 1, stride)
    }
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length + 64)
      val n = d.deflate(buf); d.end()
      buf.take(n)
    }
    def chunk(typ: String, payload: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + payload.length)
      out.putInt(payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(payload)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(depth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", deflated) ++
      chunk("IEND", Array.emptyByteArray)
  }

  test("parsePngPixels decodes gray+alpha and sub-byte grayscale exactly (vs ImageIO)") {
    // gray+alpha (color type 4, 8-bit): alpha skipped
    locally {
      val w = 5; val h = 3
      val grays = Seq.tabulate(h, w)((y, x) => (x * 50 + y * 13) % 256)
      val rows = (0 until h).map { y =>
        (0 until w).flatMap(x => Seq(grays(y)(x).toByte, 200.toByte)).toArray }
      val bytes = pngRaw(4, 8, w, h, rows)
      val got = Multimodal.parsePngPixels(bytes).get
      val want = grays.flatten.map(_.toLong).sum
      assert(got.sumR == want && got.sumG == want && got.sumB == want)
      val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(dec != null, "ImageIO rejected the gray+alpha fixture")
      var s = 0L
      (0 until h).foreach { y => (0 until w).foreach { x =>
        s += dec.getRaster.getSample(x, y, 0) } }
      assert(s == want, "ImageIO disagrees on gray+alpha")
    }
    // sub-byte grayscale: depth 1/2/4 scale exactly by 255/(2^d−1)
    Seq(1, 2, 4).foreach { depth =>
      val w = 9; val h = 4 // odd width: slack bits in the last byte
      val mask = (1 << depth) - 1
      val vals = Seq.tabulate(h, w)((y, x) => (x + y * 3) % (mask + 1))
      val perByte = 8 / depth
      val rows = (0 until h).map { y =>
        val r = new Array[Byte]((w * depth + 7) / 8)
        (0 until w).foreach { x =>
          val shift = 8 - depth - (x % perByte) * depth
          r(x / perByte) = (r(x / perByte) | (vals(y)(x) << shift)).toByte }
        r
      }
      val bytes = pngRaw(0, depth, w, h, rows)
      val got = Multimodal.parsePngPixels(bytes).get
      val want = vals.flatten.map(v => (v * (255 / mask)).toLong).sum
      assert(got.bitDepth == depth && got.sumR == want,
        s"depth $depth: ${got.sumR} vs $want")
      val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(dec != null, s"ImageIO rejected the depth-$depth gray fixture")
      var s = 0L
      (0 until h).foreach { y => (0 until w).foreach { x =>
        s += (dec.getRGB(x, y) >> 16) & 0xff } }
      assert(s == want, s"ImageIO disagrees at depth $depth: $s vs $want")
    }
    // 16-bit RGB (color type 2): top bytes
    locally {
      val w = 4; val h = 3
      val rows = (0 until h).map { y =>
        val r = new Array[Byte](w * 6)
        (0 until w * 3).foreach { s =>
          r(2 * s) = ((s * 31 + y * 7) % 256).toByte // high byte
          r(2 * s + 1) = ((s * 131) % 256).toByte // low byte, ignored
        }
        r
      }
      val bytes = pngRaw(2, 16, w, h, rows)
      val got = Multimodal.parsePngPixels(bytes).get
      var wr = 0L; var wg = 0L; var wb = 0L
      (0 until h).foreach { y => (0 until w * 3).foreach { s =>
        val v = (s * 31 + y * 7) % 256
        (s % 3) match {
          case 0 => wr += v; case 1 => wg += v; case _ => wb += v
        } } }
      assert(got.bitDepth == 16 && got.sumR == wr && got.sumG == wg && got.sumB == wb,
        s"rgb16: (${got.sumR},${got.sumG},${got.sumB}) vs ($wr,$wg,$wb)")
      val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(dec != null, "ImageIO rejected the rgb16 fixture")
      var s16 = 0L
      (0 until h).foreach { y => (0 until w).foreach { x =>
        s16 += dec.getRaster.getSample(x, y, 0) >> 8 } }
      assert(s16 == wr, "ImageIO disagrees on rgb16 top bytes")
    }
  }

  test("parsePngPixels decodes Adam7 interlaced PNGs exactly (vs ImageIO)") {
    // hand-build the seven-pass layout per the spec: each pass is a
    // sub-image of every (8/4/2)-th pixel with its own filter bytes
    val adam = Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                   (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    Seq((3, 2), (8, 8), (13, 11), (1, 1), (16, 4)).foreach { case (w, h) =>
      val px = Seq.tabulate(h, w)((y, x) =>
        ((x * 37 + y * 11) % 256, (x * 5 + y * 73) % 256, (x + y * 29) % 256))
      val raw = new java.io.ByteArrayOutputStream()
      adam.foreach { case (sx, sy, dx, dy) =>
        val xs = (sx until w by dx).toSeq; val ys = (sy until h by dy).toSeq
        if (xs.nonEmpty && ys.nonEmpty) ys.foreach { y =>
          raw.write(0) // filter None
          xs.foreach { x =>
            val (r, g, b) = px(y)(x)
            raw.write(r); raw.write(g); raw.write(b)
          }
        }
      }
      val deflated = {
        val d = new java.util.zip.Deflater()
        d.setInput(raw.toByteArray); d.finish()
        val buf = new Array[Byte](raw.size + 64)
        val n = d.deflate(buf); d.end()
        buf.take(n)
      }
      def chunk(typ: String, payload: Array[Byte]): Array[Byte] = {
        val out = java.nio.ByteBuffer.allocate(12 + payload.length)
        out.putInt(payload.length).put(typ.getBytes("US-ASCII")).put(payload)
        val crc = new java.util.zip.CRC32()
        crc.update(typ.getBytes("US-ASCII")); crc.update(payload)
        out.putInt(crc.getValue.toInt)
        out.array()
      }
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
        .put(0.toByte).put(0.toByte).put(1.toByte).array() // interlace=1
      val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      val bytes = sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", deflated) ++
        chunk("IEND", Array.emptyByteArray)
      val got = Multimodal.parsePngPixels(bytes).get
      assert(got.width == w && got.height == h && got.nPixels == w.toLong * h)
      assert(got.sumR == px.flatten.map(_._1.toLong).sum, s"${w}x$h R")
      assert(got.sumG == px.flatten.map(_._2.toLong).sum, s"${w}x$h G")
      assert(got.sumB == px.flatten.map(_._3.toLong).sum, s"${w}x$h B")
      // the JDK decoder de-interlaces the same bytes to the same image
      val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(dec != null, s"ImageIO rejected the ${w}x$h Adam7 fixture")
      var bad = 0
      (0 until h).foreach { y => (0 until w).foreach { x =>
        val (r, g, b) = px(y)(x)
        if ((dec.getRGB(x, y) & 0xffffff) != ((r << 16) | (g << 8) | b)) bad += 1 } }
      assert(bad == 0, s"ImageIO sees $bad differing pixels — fixture layout wrong")
    }
  }

  test("palette PNGs with malformed PLTE or out-of-range indices return None") {
    val palette = Seq((10, 20, 30), (40, 50, 60))
    val ok = pngPaletted(1, palette, Seq(Seq(0, 1, 1, 0)))
    assert(Multimodal.parsePngPixels(ok).isDefined)
    // index 3 at depth 2 with a 2-entry palette: malformed
    val short = pngPaletted(2, palette, Seq(Seq(0, 3, 1, 0)))
    assert(Multimodal.parsePngPixels(short).isEmpty)
    // depth-8 palette image with NO PLTE chunk at all
    val noPlte = {
      val withPlte = pngPaletted(8, palette, Seq(Seq(0, 1)))
      // splice the PLTE chunk out (12 bytes header/CRC + 6 payload)
      val plteAt = 8 + 25 // sig + IHDR chunk
      withPlte.take(plteAt) ++ withPlte.drop(plteAt + 12 + 6)
    }
    assert(Multimodal.parsePngPixels(noPlte).isEmpty)
  }

  test("parsePngPixels refuses other shapes and survives hostile bytes") {
    val ok = pngWithFilter(0, Seq(Seq((1, 2, 3))))
    assert(Multimodal.parsePngPixels(ok).isDefined)
    // invalid color type / depth / interlaced: None
    val ct5 = ok.clone(); ct5(25) = 5; assert(Multimodal.parsePngPixels(ct5).isEmpty)
    val b3 = ok.clone(); b3(24) = 3; assert(Multimodal.parsePngPixels(b3).isEmpty)
    // interlace FLAG flipped on non-interlaced data: the Adam7 pass
    // layout needs more bytes than the stream holds → clean None.
    // (On a 1x1 image the layouts coincide and decoding is correct —
    // so the flip is exercised on a 6x6 fixture below instead.)
    val il1 = ok.clone(); il1(28) = 1
    assert(Multimodal.parsePngPixels(il1).contains(
      Multimodal.parsePngPixels(ok).get), "1x1 Adam7 == 1x1 sequential")
    // truncated deflate stream: clean None, not an exception. (Cut
    // INTO the IDAT payload — snipping only the trailing CRC/IEND
    // leaves a complete deflate stream, which decodes, correctly.)
    val big = pngWithFilter(4,
      Seq.tabulate(6, 6)((y, x) => (x * 40, y * 40, (x + y) * 20)))
    assert(Multimodal.parsePngPixels(big).isDefined)
    assert(Multimodal.parsePngPixels(big.take(big.length * 6 / 10)).isEmpty)
    val il6 = big.clone(); il6(28) = 1
    assert(Multimodal.parsePngPixels(il6).isEmpty, "6x6 Adam7 needs more bytes")
    // corrupt filter tag inside a VALID deflate stream
    assert(Multimodal.parsePngPixels("not a png at all".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.parsePngPixels(null).isEmpty)
  }

  test("parsePngPixels bails (no busy-loop) on an FDICT zlib stream") {
    // A zlib header with the FDICT bit set makes Inflater.inflate()
    // return 0 with needsInput()=false and finished()=false forever —
    // the decoder must return None, not spin in the executor task.
    def chunk(typ: String, payload: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + payload.length)
      out.putInt(payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(payload)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(2).putInt(2).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    // CMF=0x78, FLG=0x20: FDICT set AND (0x7820 % 31 == 0) so the
    // header itself is VALID zlib — followed by a DICTID + junk.
    val fdictIdat = Array[Byte](0x78, 0x20, 1, 2, 3, 4, 0x5a, 0x5a, 0x5a, 0x5a)
    val evil = sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", fdictIdat) ++
      chunk("IEND", Array.emptyByteArray)
    val t0 = System.nanoTime()
    assert(Multimodal.parsePngPixels(evil).isEmpty)
    assert(System.nanoTime() - t0 < 5e9, "FDICT stream must fail fast, not spin")
  }

  // ---- JPEG vs javax.imageio -------------------------------------

  private def encodeJpeg(img: java.awt.image.BufferedImage, quality: Float,
                         progressive: Boolean = false): Array[Byte] = {
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    if (progressive)
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    wr.setOutput(new javax.imageio.stream.MemoryCacheImageOutputStream(bos))
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    wr.dispose()
    bos.toByteArray
  }

  /** True iff the stream's frame marker is SOF2 (progressive). */
  private def isProgressive(b: Array[Byte]): Boolean = {
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return false
      val m = b(i + 1) & 0xff
      if (m == 0xc2) return true
      if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) return false
      i += 2 + (((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff))
    }
    false
  }

  test("parseJpegPixels decodes flat-tile quality-1.0 JPEGs bit-exactly (vs formula AND ImageIO)") {
    // quality 1.0 → all-ones quant tables; a flat 16×16 MCU has only a
    // DC coefficient, which quantizes losslessly — so decode is EXACT
    // for any spec-conformant decoder (verified for all 256 gray
    // levels by construction here: tiles cycle the full byte range)
    (0 until 4).foreach { trial =>
      val tw = 2 + trial; val th = 2 + (trial % 2)
      val w = 16 * tw; val h = 16 * th
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var want = 0L
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          val g = (trial * 61 + (x / 16) * 67 + (y / 16) * 73) % 256
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
        }
      }
      (0 until th).foreach { ty => (0 until tw).foreach { tx =>
        want += ((trial * 61 + tx * 67 + ty * 73) % 256).toLong * 256 } }
      val bytes = encodeJpeg(img, 1.0f)
      val got = Multimodal.parseJpegPixels(bytes).get
      assert(got.width == w && got.height == h && got.nComponents == 3)
      assert(got.nPixels == w.toLong * h)
      assert(got.sumR == want && got.sumG == want && got.sumB == want,
        s"${w}x$h: (${got.sumR},${got.sumG},${got.sumB}) vs formula $want")
      // and the independent decoder agrees on the same bytes
      val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var ir = 0L
      (0 until h).foreach { y => (0 until w).foreach { x =>
        ir += (dec.getRGB(x, y) >> 16) & 0xff } }
      assert(ir == want, "ImageIO disagrees with the flat-tile formula")
    }
  }

  test("jpegRgbGrid: flat tiles exact, sums match parseJpegPixels, progressive refused, fences") {
    // flat tiles: every materialized pixel equals the tile formula
    val tw = 2; val th = 1
    val img = new java.awt.image.BufferedImage(
      16 * tw, 16 * th, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 16 * th).foreach { y => (0 until 16 * tw).foreach { x =>
      val g = (37 + (x / 16) * 67) % 256
      img.setRGB(x, y, (g << 16) | (g << 8) | g) } }
    val flat = encodeJpeg(img, 1.0f)
    val (fw, fh, fg) = Multimodal.jpegRgbGrid(flat).get
    assert(fw == 32 && fh == 16)
    (0 until fh).foreach { y => (0 until fw).foreach { x =>
      val g = (37 + (x / 16) * 67) % 256
      assert(fg(y * fw + x) == ((g << 16) | (g << 8) | g), s"($x,$y)") } }
    // arbitrary color JPEG: grid channel sums == parseJpegPixels sums
    // (same planes, same upsample/convert arithmetic — exact parity)
    val noisy = new java.awt.image.BufferedImage(
      37, 23, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 23).foreach { y => (0 until 37).foreach { x =>
      noisy.setRGB(x, y, rnd.nextInt(1 << 24)) } }
    val nb = encodeJpeg(noisy, 0.8f)
    val st = Multimodal.parseJpegPixels(nb).get
    val (nw, nh, ng) = Multimodal.jpegRgbGrid(nb).get
    assert(nw == st.width && nh == st.height)
    var sr = 0L; var sg = 0L; var sb = 0L
    ng.foreach { p =>
      sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff }
    assert(sr == st.sumR && sg == st.sumG && sb == st.sumB)
    // progressive refused by the grid tier (stats path still decodes it)
    val prog = encodeJpeg(img, 1.0f, progressive = true)
    assert(Multimodal.parseJpegPixels(prog).isDefined)
    assert(Multimodal.jpegRgbGrid(prog).isEmpty)
    // maxPixels fence from the header, junk and null refused
    assert(Multimodal.jpegRgbGrid(nb, maxPixels = 100).isEmpty)
    assert(Multimodal.jpegRgbGrid("not a jpeg".getBytes).isEmpty)
    assert(Multimodal.jpegRgbGrid(null).isEmpty)
    (1 until nb.length by 7).foreach(n => Multimodal.jpegRgbGrid(nb.take(n)))
  }

  test("parseJpegPixels tracks ImageIO within IDCT tolerance on grayscale noise") {
    // 1-component JPEG: no chroma upsampling in play, so the only
    // decoder freedom is the IDCT approximation — per-sample error is
    // bounded by ~1 level, so channel sums track within nPixels
    Seq(0.95f, 0.75f, 0.5f).foreach { q =>
      val w = 40 + rnd.nextInt(30); val h = 24 + rnd.nextInt(20)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until h).foreach { y => (0 until w).foreach { x =>
        val g = rnd.nextInt(256)
        img.getRaster.setSample(x, y, 0, g) } }
      val bytes = encodeJpeg(img, q)
      val got = Multimodal.parseJpegPixels(bytes).get
      assert(got.width == w && got.height == h && got.nComponents == 1)
      val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var sum = 0L
      (0 until h).foreach { y => (0 until w).foreach { x =>
        sum += dec.getRaster.getSample(x, y, 0) } }
      val n = w.toLong * h
      assert(math.abs(got.sumR - sum) <= n,
        s"q=$q ${w}x$h: ${got.sumR} vs ImageIO $sum (tolerance $n)")
      assert(got.sumG == got.sumR && got.sumB == got.sumR)
    }
  }

  test("parseJpegPixels tracks ImageIO on smooth color images (chroma subsampled)") {
    // smooth gradients keep nearest-vs-interpolated chroma upsampling
    // differences small; bounds are per-channel mean within 2 levels
    val w = 64; val h = 48
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach { y => (0 until w).foreach { x =>
      val r = (x * 255) / (w - 1); val g = (y * 255) / (h - 1)
      val b = ((x + y) * 255) / (w + h - 2)
      img.setRGB(x, y, (r << 16) | (g << 8) | b) } }
    val bytes = encodeJpeg(img, 0.85f)
    val got = Multimodal.parseJpegPixels(bytes).get
    assert(got.width == w && got.height == h && got.nComponents == 3)
    val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var sr = 0L; var sg = 0L; var sb = 0L
    (0 until h).foreach { y => (0 until w).foreach { x =>
      val p = dec.getRGB(x, y)
      sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff } }
    val tol = 2L * w * h
    assert(math.abs(got.sumR - sr) <= tol, s"R ${got.sumR} vs $sr")
    assert(math.abs(got.sumG - sg) <= tol, s"G ${got.sumG} vs $sg")
    assert(math.abs(got.sumB - sb) <= tol, s"B ${got.sumB} vs $sb")
  }

  /** Hand-rolled baseline grayscale JPEG encoder for flat 8×8 tiles
    * with CUSTOM Huffman tables and a restart interval — exercises the
    * DHT canonical-code builder, DC prediction reset and RSTn
    * consumption on bytes no JDK encoder would emit. */
  private def handJpeg(tiles: Seq[Int], tilesPerRow: Int, dri: Int): Array[Byte] = {
    val w = tilesPerRow * 8; val h = (tiles.length / tilesPerRow) * 8
    val out = new java.io.ByteArrayOutputStream()
    def b(x: Int): Unit = out.write(x & 0xff)
    def b16(x: Int): Unit = { b(x >> 8); b(x) }
    b(0xff); b(0xd8) // SOI
    b(0xff); b(0xdb); b16(2 + 1 + 64); b(0x00) // DQT id 0, 8-bit
    (0 until 64).foreach(_ => b(1)) // all-ones → lossless DC
    // DHT: DC table 0 = symbols 0..11, all 4-bit codes (canonical
    // 0000…1011, none all-ones); AC table 0 = single EOB at 1 bit
    b(0xff); b(0xc4); b16(2 + 17 + 12 + 17 + 1)
    b(0x00); (1 to 16).foreach(l => b(if (l == 4) 12 else 0)); (0 to 11).foreach(b)
    b(0x10); (1 to 16).foreach(l => b(if (l == 1) 1 else 0)); b(0x00)
    b(0xff); b(0xc0); b16(2 + 6 + 3) // SOF0: 1 component, 1x1
    b(8); b16(h); b16(w); b(1); b(1); b(0x11); b(0)
    if (dri > 0) { b(0xff); b(0xdd); b16(4); b16(dri) }
    b(0xff); b(0xda); b16(2 + 1 + 2 + 3) // SOS
    b(1); b(1); b(0x00); b(0); b(63); b(0)
    // bit writer with FF-stuffing
    var acc = 0; var nb = 0
    def putBits(v: Int, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        acc = (acc << 1) | ((v >> k) & 1); nb += 1
        if (nb == 8) { b(acc); if (acc == 0xff) b(0x00); acc = 0; nb = 0 }
        k -= 1
      }
    }
    def flushAlign(): Unit = if (nb > 0) { putBits((1 << (8 - nb)) - 1, 8 - nb) }
    var pred = 0; var rst = 0
    tiles.zipWithIndex.foreach { case (g, idx) =>
      if (dri > 0 && idx > 0 && idx % dri == 0) {
        flushAlign(); b(0xff); b(0xd0 + rst); rst = (rst + 1) % 8; pred = 0
      }
      val dc = 8 * (g - 128)
      val diff = dc - pred; pred = dc
      val t = 32 - Integer.numberOfLeadingZeros(math.abs(diff)) // category
      putBits(t, 4) // DC symbol t = canonical code t at 4 bits
      if (t > 0) putBits(if (diff >= 0) diff else diff + (1 << t) - 1, t)
      putBits(0, 1) // AC EOB (code 0, length 1)
    }
    flushAlign()
    b(0xff); b(0xd9) // EOI
    out.toByteArray
  }

  test("parseJpegPixels honors restart intervals and custom Huffman tables (vs ImageIO)") {
    val tiles = Seq(0, 255, 17, 200, 128, 33, 99, 250) // 4x2 MCUs of 8x8
    Seq(0, 2, 3).foreach { dri =>
      val bytes = handJpeg(tiles, tilesPerRow = 4, dri = dri)
      val got = Multimodal.parseJpegPixels(bytes).get
      val want = tiles.map(_.toLong * 64).sum
      assert(got.width == 32 && got.height == 16 && got.nComponents == 1)
      assert(got.sumR == want, s"dri=$dri: ${got.sumR} vs $want")
      // the JDK decoder accepts the same hand-rolled stream and agrees
      val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(dec != null, s"ImageIO rejected the dri=$dri fixture")
      var sum = 0L
      (0 until 16).foreach { y => (0 until 32).foreach { x =>
        sum += dec.getRaster.getSample(x, y, 0) } }
      assert(sum == want, s"ImageIO dri=$dri: $sum vs $want")
    }
  }

  test("parseJpegPixels decodes PROGRESSIVE flat-tile quality-1.0 JPEGs bit-exactly") {
    // the q243 argument carries over: all-ones quant tables make a
    // flat MCU's lone DC coefficient lossless, no matter how many
    // scans and successive-approximation bits deliver it
    (0 until 3).foreach { trial =>
      val tw = 2 + trial; val th = 2
      val w = 16 * tw; val h = 16 * th
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var want = 0L
      (0 until h).foreach { y => (0 until w).foreach { x =>
        val g = (trial * 77 + (x / 16) * 59 + (y / 16) * 43) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g) } }
      (0 until th).foreach { ty => (0 until tw).foreach { tx =>
        want += ((trial * 77 + tx * 59 + ty * 43) % 256).toLong * 256 } }
      val bytes = encodeJpeg(img, 1.0f, progressive = true)
      assert(isProgressive(bytes), "ImageIO did not emit SOF2")
      val got = Multimodal.parseJpegPixels(bytes).get
      assert(got.width == w && got.height == h && got.nComponents == 3)
      assert(got.sumR == want && got.sumG == want && got.sumB == want,
        s"${w}x$h: (${got.sumR},${got.sumG},${got.sumB}) vs formula $want")
    }
  }

  test("progressive decode tracks ImageIO within IDCT tolerance (gray noise + color)") {
    Seq(0.9f, 0.6f).foreach { q =>
      val w = 40 + rnd.nextInt(25); val h = 24 + rnd.nextInt(17)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until h).foreach { y => (0 until w).foreach { x =>
        img.getRaster.setSample(x, y, 0, rnd.nextInt(256)) } }
      val bytes = encodeJpeg(img, q, progressive = true)
      assert(isProgressive(bytes))
      val got = Multimodal.parseJpegPixels(bytes).get
      assert(got.width == w && got.height == h && got.nComponents == 1)
      val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var sum = 0L
      (0 until h).foreach { y => (0 until w).foreach { x =>
        sum += dec.getRaster.getSample(x, y, 0) } }
      assert(math.abs(got.sumR - sum) <= w.toLong * h,
        s"prog q=$q ${w}x$h: ${got.sumR} vs ImageIO $sum")
    }
    // smooth color, 4:2:0 subsampled, multi-scan
    val w = 64; val h = 48
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach { y => (0 until w).foreach { x =>
      val r = (x * 255) / (w - 1); val g = (y * 255) / (h - 1)
      val b = ((x + y) * 255) / (w + h - 2)
      img.setRGB(x, y, (r << 16) | (g << 8) | b) } }
    val bytes = encodeJpeg(img, 0.8f, progressive = true)
    assert(isProgressive(bytes))
    val got = Multimodal.parseJpegPixels(bytes).get
    val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var sr = 0L; var sg = 0L; var sb = 0L
    (0 until h).foreach { y => (0 until w).foreach { x =>
      val p = dec.getRGB(x, y)
      sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff } }
    val tol = 2L * w * h
    assert(math.abs(got.sumR - sr) <= tol, s"R ${got.sumR} vs $sr")
    assert(math.abs(got.sumG - sg) <= tol, s"G ${got.sumG} vs $sg")
    assert(math.abs(got.sumB - sb) <= tol, s"B ${got.sumB} vs $sb")
  }

  test("progressive decode survives truncation and corruption (strict None, no throw)") {
    val img = new java.awt.image.BufferedImage(
      32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 32).foreach { y => (0 until 32).foreach { x =>
      img.setRGB(x, y, rnd.nextInt(1 << 24)) } }
    val ok = encodeJpeg(img, 0.85f, progressive = true)
    assert(isProgressive(ok) && Multimodal.parseJpegPixels(ok).isDefined)
    // truncation at many cut points: strict None (no partial render)
    (2 until ok.length by 11).foreach { cut =>
      assert(Multimodal.parseJpegPixels(ok.take(cut)).isEmpty, s"cut=$cut")
    }
    // corruption: never a throw, never a spin
    val t0 = System.nanoTime()
    (1 to 300).foreach { k =>
      val c = ok.clone()
      (0 to k % 4).foreach { _ =>
        c(2 + rnd.nextInt(c.length - 2)) = rnd.nextInt(256).toByte }
      Multimodal.parseJpegPixels(c)
    }
    assert(System.nanoTime() - t0 < 30e9)
  }

  test("parseJpegPixels refuses other tiers and survives hostile bytes") {
    val img = new java.awt.image.BufferedImage(
      24, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 16).foreach { y => (0 until 24).foreach { x =>
      img.setRGB(x, y, rnd.nextInt(1 << 24)) } }
    val ok = encodeJpeg(img, 0.9f)
    assert(Multimodal.parseJpegPixels(ok).isDefined)
    // progressive: different tier → None (flip SOF0 marker to SOF2)
    val prog = ok.clone()
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(Multimodal.parseJpegPixels(prog).isEmpty)
    // truncations at every byte boundary: clean None or a clean Some,
    // never a throw or a spin
    val t0 = System.nanoTime()
    (2 until ok.length by 7).foreach { cut =>
      Multimodal.parseJpegPixels(ok.take(cut)) // must not throw
    }
    assert(System.nanoTime() - t0 < 30e9, "truncation sweep must not spin")
    // random byte corruption (single and multi-byte): never a throw —
    // this fuzz caught the unvalidated SOS table ids on first run
    (1 to 300).foreach { k =>
      val c = ok.clone()
      (0 to k % 4).foreach { _ =>
        c(2 + rnd.nextInt(c.length - 2)) = rnd.nextInt(256).toByte }
      Multimodal.parseJpegPixels(c)
    }
    assert(Multimodal.parseJpegPixels("not a jpeg".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.parseJpegPixels(null).isEmpty)
    assert(Multimodal.parseJpegPixels(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
  }

  // ---- GIF frame count vs javax.imageio --------------------------

  private def randomGif(nFrames: Int): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    def b(x: Int): Unit = bb.write(x & 0xff)
    "GIF89a".getBytes("US-ASCII").foreach(bb.write(_))
    b(2); b(0); b(2); b(0); b(0x80); b(0); b(0) // 2x2, GCT of 2 entries
    (0 until 6).foreach(_ => b(rnd.nextInt(256)))
    (0 until nFrames).foreach { _ =>
      val d = rnd.nextInt(200)
      b(0x21); b(0xf9); b(4); b(0); b(d); b(d >> 8); b(0); b(0)
      b(0x2c); b(0); b(0); b(0); b(0); b(2); b(0); b(2); b(0); b(0)
      // valid minimal LZW for a 2-color 2x2 image: ImageIO decodes it
      b(2)       // LZW minimum code size
      b(2); b(0x44); b(0x01) // clear, 4 pixels of color 0, end
      b(0)
    }
    b(0x3b)
    bb.toByteArray
  }

  // ---- TIFF vs javax.imageio (JDK 9+ ships a TIFF plugin) --------

  private def encodeTiff(img: java.awt.image.BufferedImage,
                         compression: Option[String]): Array[Byte] = {
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val p = wr.getDefaultWriteParam
    compression match {
      case Some(c) =>
        p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionType(c)
      case None =>
        p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    wr.dispose()
    ios.close() // TIFF writer does not flush the cache on its own
    bos.toByteArray
  }

  test("parseTiffPixels decodes ImageIO TIFFs exactly: none/LZW/PackBits, RGB and gray") {
    Seq(None, Some("LZW"), Some("PackBits")).foreach { comp =>
      // RGB with structured runs (exercises LZW dictionaries + RLE)
      val w = 21 + rnd.nextInt(30); val h = 9 + rnd.nextInt(20)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var sr = 0L; var sg = 0L; var sb = 0L
      (0 until h).foreach { y => (0 until w).foreach { x =>
        val (r, g, b) =
          if ((x / 4 + y / 2) % 2 == 0) (10, 200, 30)
          else (rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256))
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        sr += r; sg += g; sb += b } }
      val bytes = encodeTiff(img, comp)
      val got = Multimodal.parseTiffPixels(bytes)
        .getOrElse(fail(s"rejected ImageIO TIFF comp=$comp"))
      assert(got.width == w && got.height == h && got.nPixels == w.toLong * h,
        s"comp=$comp geom")
      assert(got.sumR == sr && got.sumG == sg && got.sumB == sb,
        s"comp=$comp: (${got.sumR},${got.sumG},${got.sumB}) vs ($sr,$sg,$sb)")
      // grayscale leg
      val gi = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      var s = 0L
      (0 until h).foreach { y => (0 until w).foreach { x =>
        val g = if (x % 3 == 0) 77 else rnd.nextInt(256)
        gi.getRaster.setSample(x, y, 0, g); s += g } }
      val gotG = Multimodal.parseTiffPixels(encodeTiff(gi, comp))
        .getOrElse(fail(s"rejected gray TIFF comp=$comp"))
      assert(gotG.sumR == s && gotG.sumG == s && gotG.sumB == s, s"gray comp=$comp")
    }
  }

  /** Hand-built little-endian TIFF: one strip, chosen photometric /
    * compression (1 or 32773) over raw sample bytes. */
  private def tiffRaw(w: Int, h: Int, spp: Int, photometric: Int,
                      samples: Array[Byte], packBits: Boolean = false,
                      colorMap: Option[Array[Int]] = None): Array[Byte] = {
    val data =
      if (!packBits) samples
      else { // naive PackBits: literal runs of <=128
        val out = new java.io.ByteArrayOutputStream()
        samples.grouped(128).foreach { chunk =>
          out.write(chunk.length - 1); out.write(chunk, 0, chunk.length)
        }
        out.toByteArray
      }
    val bb = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bb.write(v & 0xff); bb.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
    bb.write('I'); bb.write('I'); w16(42)
    val nTags = 10 + (if (colorMap.isDefined) 1 else 0)
    val dataOff = 8L + 2 + 12 * nTags + 4
    val mapOff = dataOff + data.length
    w32(8) // IFD at 8
    w16(nTags)
    def tag(t: Int, typ: Int, cnt: Long, v: Long): Unit = {
      w16(t); w16(typ); w32(cnt); w32(v)
    }
    tag(256, 3, 1, w); tag(257, 3, 1, h)
    tag(258, 3, 1, 8) // BitsPerSample: one SHORT (applies to all here)
    tag(259, 3, 1, if (packBits) 32773 else 1)
    tag(262, 3, 1, photometric)
    tag(273, 4, 1, dataOff) // StripOffsets
    tag(277, 3, 1, spp)
    tag(278, 3, 1, h) // one strip
    tag(279, 4, 1, data.length)
    tag(284, 3, 1, 1) // PlanarConfiguration chunky
    colorMap.foreach(_ => tag(320, 3, 3 * 256, mapOff))
    w32(0) // next IFD
    bb.write(data)
    colorMap.foreach(cm => cm.foreach(w16))
    bb.toByteArray
  }

  test("parseTiffPixels: hand-built little-endian, WhiteIsZero, palette, PackBits (vs ImageIO)") {
    // gray WhiteIsZero: values invert
    val w = 7; val h = 3
    val gray = Array.tabulate(w * h)(i => ((i * 19) % 256).toByte)
    val wiz = tiffRaw(w, h, 1, 0, gray)
    val got = Multimodal.parseTiffPixels(wiz).get
    val want = gray.map(b => 255L - (b & 0xff)).sum
    assert(got.sumR == want && got.sumG == want && got.sumB == want)
    // raw raster samples (getRGB would run gray through a linear→sRGB
    // colorspace conversion); the reader keeps WhiteIsZero samples
    // as stored, so invert like the photometric says
    val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(wiz))
    assert(dec != null, "ImageIO rejected WhiteIsZero fixture")
    var s = 0L
    // (the JDK reader already normalizes WhiteIsZero in the raster)
    (0 until h).foreach { y => (0 until w).foreach { x =>
      s += dec.getRaster.getSample(x, y, 0) } }
    assert(s == want, "ImageIO disagrees on WhiteIsZero")
    // palette: ColorMap 16-bit planes in the canonical replicated
    // form c*257 (= c<<8|c, how 8-bit palettes are widened) — there
    // the top-byte contract and ImageIO's 255/65535 scaling agree
    // exactly; non-replicated maps may differ by one level
    val cm = new Array[Int](3 * 256)
    (0 until 256).foreach { k =>
      cm(k) = ((k * 31) % 256) * 257; cm(256 + k) = ((k * 47) % 256) * 257
      cm(512 + k) = ((k * 61) % 256) * 257 }
    val idx = Array.tabulate(w * h)(i => ((i * 7) % 256).toByte)
    val pal = tiffRaw(w, h, 1, 3, idx, colorMap = Some(cm))
    val gotP = Multimodal.parseTiffPixels(pal).get
    assert(gotP.sumR == idx.map(i => ((i & 0xff) * 31 % 256).toLong).sum)
    assert(gotP.sumG == idx.map(i => ((i & 0xff) * 47 % 256).toLong).sum)
    assert(gotP.sumB == idx.map(i => ((i & 0xff) * 61 % 256).toLong).sum)
    val decP = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(pal))
    assert(decP != null, "ImageIO rejected palette fixture")
    var sp = 0L
    (0 until h).foreach { y => (0 until w).foreach { x =>
      sp += (decP.getRGB(x, y) >> 16) & 0xff } }
    assert(sp == gotP.sumR, "ImageIO disagrees on palette")
    // RGB via hand PackBits
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 13) % 256).toByte)
    val pb = tiffRaw(w, h, 3, 2, rgb, packBits = true)
    val gotB = Multimodal.parseTiffPixels(pb).get
    assert(gotB.compression == 32773)
    assert(gotB.sumR == (0 until w * h).map(i => (rgb(3 * i) & 0xff).toLong).sum)
  }

  test("parseTiffPixels clamps truncation and survives hostile bytes") {
    val img = new java.awt.image.BufferedImage(
      24, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 16).foreach { y => (0 until 24).foreach { x =>
      img.setRGB(x, y, rnd.nextInt(1 << 24)) } }
    val ok = encodeTiff(img, Some("LZW"))
    assert(Multimodal.parseTiffPixels(ok).isDefined)
    val t0 = System.nanoTime()
    (1 to 300).foreach { k =>
      val c = ok.clone()
      (0 to k % 4).foreach { _ =>
        c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte }
      Multimodal.parseTiffPixels(c) // never a throw
    }
    // truncations
    (8 until ok.length by 13).foreach { cut =>
      Multimodal.parseTiffPixels(ok.take(cut))
    }
    assert(System.nanoTime() - t0 < 30e9)
    assert(Multimodal.parseTiffPixels("II*but not a tiff".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.parseTiffPixels(null).isEmpty)
  }

  // ---- GIF LZW pixel decode vs javax.imageio ---------------------

  test("parseGifPixels decodes ImageIO-ENCODED GIFs exactly (real LZW dictionaries)") {
    // h >= 5: the JDK's own GIF writer+reader round-trip is BROKEN for
    // interlaced images of height 2-4 (the writer's tiny-height pass
    // emission mismatches the reader's de-interlace; verified directly
    // with ImageIO-only round trips — our decoder bit-matched the
    // written LZW stream while ImageIO lost rows). Real GIFs are
    // taller; the hand-rolled fixtures below cover tiny geometries.
    (1 to 10).foreach { _ =>
      val w = 3 + rnd.nextInt(40); val h = 5 + rnd.nextInt(30)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
      (0 until h).foreach { y => (0 until w).foreach { x =>
        // runs of repeated colors force real dictionary growth
        img.setRGB(x, y, if ((x / 5 + y / 3) % 2 == 0) 0x333333
                         else rnd.nextInt(1 << 24)) } }
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "gif", baos))
      val bytes = baos.toByteArray
      val got = Multimodal.parseGifPixels(bytes).get
      val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var sr = 0L; var sg = 0L; var sb = 0L
      (0 until h).foreach { y => (0 until w).foreach { x =>
        val p = dec.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff } }
      assert(got.frameW == w && got.frameH == h && got.nPixels == w.toLong * h)
      assert(got.sumR == sr && got.sumG == sg && got.sumB == sb,
        s"${w}x$h: (${got.sumR},${got.sumG},${got.sumB}) vs ($sr,$sg,$sb)")
    }
  }

  /** Hand-rolled GIF with a CLEAR-per-pixel LZW stream: every pixel a
    * fresh literal code — dictionary never grows, width stays fixed. */
  private def gifClearPerPixel(palette: Seq[(Int, Int, Int)],
                               idx: Seq[Seq[Int]]): Array[Byte] = {
    val h = idx.length; val w = idx.head.length
    val bits = math.max(1, 32 - Integer.numberOfLeadingZeros(palette.length - 1))
    val minCode = math.max(2, bits)
    val clear = 1 << minCode; val eoi = clear + 1
    val bb = new java.io.ByteArrayOutputStream()
    def b(x: Int): Unit = bb.write(x & 0xff)
    "GIF89a".getBytes("US-ASCII").foreach(bb.write(_))
    b(w); b(w >> 8); b(h); b(h >> 8)
    b(0x80 | (minCode - 1)); b(0); b(0) // GCT of 2^minCode entries
    (0 until (1 << minCode)).foreach { i =>
      val (r, g, bl) = if (i < palette.length) palette(i) else (0, 0, 0)
      b(r); b(g); b(bl)
    }
    b(0x2c); b(0); b(0); b(0); b(0); b(w); b(w >> 8); b(h); b(h >> 8); b(0)
    b(minCode)
    // LSB-first bit writer into sub-blocks
    val codes = idx.flatten.flatMap(i => Seq(clear, i)) :+ eoi
    val width = minCode + 1
    var acc = 0L; var nb = 0
    val payload = new java.io.ByteArrayOutputStream()
    codes.foreach { c =>
      acc |= c.toLong << nb; nb += width
      while (nb >= 8) { payload.write((acc & 0xff).toInt); acc >>= 8; nb -= 8 }
    }
    if (nb > 0) payload.write((acc & 0xff).toInt)
    val data = payload.toByteArray
    data.grouped(255).foreach { chunk => b(chunk.length); bb.write(chunk) }
    b(0) // block terminator
    b(0x3b)
    bb.toByteArray
  }

  test("parseGifPixels handles clear-per-pixel streams and the KwKwK case (vs ImageIO)") {
    val palette = Seq((10, 20, 30), (200, 100, 50), (0, 255, 7), (99, 98, 97))
    val idx = Seq(Seq(0, 1, 2, 3, 0), Seq(3, 2, 1, 0, 1), Seq(1, 1, 0, 2, 3))
    val bytes = gifClearPerPixel(palette, idx)
    val got = Multimodal.parseGifPixels(bytes).get
    val want = idx.flatten.map(palette)
    assert(got.frameW == 5 && got.frameH == 3 && got.nPixels == 15)
    assert(got.sumR == want.map(_._1.toLong).sum)
    assert(got.sumG == want.map(_._2.toLong).sum)
    assert(got.sumB == want.map(_._3.toLong).sum)
    // the JDK decoder accepts the same hand-rolled stream and agrees
    val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(dec != null, "ImageIO rejected the clear-per-pixel fixture")
    var sr = 0L
    (0 until 3).foreach { y => (0 until 5).foreach { x =>
      sr += (dec.getRGB(x, y) >> 16) & 0xff } }
    assert(sr == got.sumR, "ImageIO disagrees on the hand-rolled stream")
    // KwKwK: "aaaa" compresses to [CLEAR, a, dictSize] — the code
    // references the entry being defined
    val kw = {
      val minCode = 2; val clear = 4
      val codes = Seq(clear, 0, 6, 5) // a, aa(KwKwK), eoi... 5 IS eoi
      val bb = new java.io.ByteArrayOutputStream()
      def b(x: Int): Unit = bb.write(x & 0xff)
      "GIF89a".getBytes("US-ASCII").foreach(bb.write(_))
      b(3); b(0); b(1); b(0); b(0x81); b(0); b(0)
      Seq((5, 6, 7), (50, 60, 70), (0, 0, 0), (0, 0, 0)).foreach {
        case (r, g, bl) => b(r); b(g); b(bl) }
      b(0x2c); b(0); b(0); b(0); b(0); b(3); b(0); b(1); b(0); b(0)
      b(minCode)
      var acc = 0L; var nb = 0
      val payload = new java.io.ByteArrayOutputStream()
      codes.foreach { c =>
        acc |= c.toLong << nb; nb += 3
        while (nb >= 8) { payload.write((acc & 0xff).toInt); acc >>= 8; nb -= 8 }
      }
      if (nb > 0) payload.write((acc & 0xff).toInt)
      val data = payload.toByteArray
      b(data.length); bb.write(data); b(0); b(0x3b)
      bb.toByteArray
    }
    val kwGot = Multimodal.parseGifPixels(kw).get
    // pixels: a, a, a (3x1 of palette 0)
    assert(kwGot.nPixels == 3 && kwGot.sumR == 15 && kwGot.sumG == 18 &&
      kwGot.sumB == 21, kwGot.toString)
  }

  test("parseGifPixels clamps truncation and survives hostile bytes") {
    val palette = Seq((1, 2, 3), (40, 50, 60), (70, 80, 90), (11, 12, 13))
    val idx = Seq.tabulate(6, 9)((y, x) => (x + y) % 4)
    val ok = gifClearPerPixel(palette, idx)
    assert(Multimodal.parseGifPixels(ok).isDefined)
    // cut INSIDE the LZW data: fully-decoded pixels only, no throw
    val cut = Multimodal.parseGifPixels(ok.take(ok.length - 12))
    assert(cut.isDefined && cut.get.nPixels < 54 && cut.get.nPixels >= 0)
    // random corruption: never a throw, never a spin
    val t0 = System.nanoTime()
    (1 to 200).foreach { k =>
      val c = ok.clone()
      (0 to k % 3).foreach { _ =>
        c(6 + rnd.nextInt(c.length - 6)) = rnd.nextInt(256).toByte }
      Multimodal.parseGifPixels(c)
    }
    assert(System.nanoTime() - t0 < 30e9)
    assert(Multimodal.parseGifPixels("GIF89a but not really".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.parseGifPixels(null).isEmpty)
    // a final code expanding PAST the declared frame clamps: 2x1
    // frame, stream [CLEAR, a, KwKwK("aa")] would emit 3 pixels
    val over = {
      val bb = new java.io.ByteArrayOutputStream()
      def b(x: Int): Unit = bb.write(x & 0xff)
      "GIF89a".getBytes("US-ASCII").foreach(bb.write(_))
      b(2); b(0); b(1); b(0); b(0x81); b(0); b(0)
      Seq((9, 11, 13), (0, 0, 0), (0, 0, 0), (0, 0, 0)).foreach {
        case (r, g, bl) => b(r); b(g); b(bl) }
      b(0x2c); b(0); b(0); b(0); b(0); b(2); b(0); b(1); b(0); b(0)
      b(2) // minCode; codes 3-bit: 4=clear, 0, 6=KwKwK
      var acc = 0L; var nb = 0
      val payload = new java.io.ByteArrayOutputStream()
      Seq(4, 0, 6, 5).foreach { c =>
        acc |= c.toLong << nb; nb += 3
        while (nb >= 8) { payload.write((acc & 0xff).toInt); acc >>= 8; nb -= 8 }
      }
      if (nb > 0) payload.write((acc & 0xff).toInt)
      val data = payload.toByteArray
      b(data.length); bb.write(data); b(0); b(0x3b)
      bb.toByteArray
    }
    val ov = Multimodal.parseGifPixels(over).get
    assert(ov.nPixels == 2 && ov.sumR == 18 && ov.sumG == 22 && ov.sumB == 26,
      s"overrun must clamp to the declared frame: $ov")
  }

  test("decodeAuSamples matches javax.sound conversion; audioEnergyHash is gain-invariant") {
    // μ-law AU: samples must equal javax.sound's own ULAW→PCM16 output
    val n = 65 * 3
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(bos)
    d.writeBytes(".snd"); d.writeInt(24); d.writeInt(n)
    d.writeInt(1); d.writeInt(8000); d.writeInt(1)
    (0 until n).foreach(i => d.writeByte((i * 37 + 11) % 256))
    val bytes = bos.toByteArray
    val got = Multimodal.decodeAuSamples(bytes).get
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val pcm = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      8000, 16, 1, 2, 8000, true)
    val out = javax.sound.sampled.AudioSystem
      .getAudioInputStream(pcm, ais).readAllBytes()
    val javaVals = Array.tabulate(n)(i =>
      (((out(2 * i) & 0xff) << 8) | (out(2 * i + 1) & 0xff)).toShort.toInt)
    assert(got.sameElements(javaVals), "decodeAuSamples vs javax.sound")
    // multi-channel: only channel 0 is kept
    val bos2 = new java.io.ByteArrayOutputStream()
    val d2 = new java.io.DataOutputStream(bos2)
    d2.writeBytes(".snd"); d2.writeInt(24); d2.writeInt(4 * n)
    d2.writeInt(3); d2.writeInt(8000); d2.writeInt(2)
    (0 until n).foreach { i => d2.writeShort(i * 17 - 500); d2.writeShort(9999) }
    assert(Multimodal.decodeAuSamples(bos2.toByteArray).get
      .sameElements(Array.tabulate(n)(i => i * 17 - 500)))
    // maxFrames fence + refusals
    assert(Multimodal.decodeAuSamples(bytes, maxFrames = 70).get.length == 70)
    assert(Multimodal.decodeAuSamples("nope".getBytes).isEmpty)
    assert(Multimodal.decodeAuSamples(null).isEmpty)
    // hash: uniform gain preserves every adjacent-energy comparison
    val h = Multimodal.audioEnergyHash(got).get
    assert(Multimodal.audioEnergyHash(got.map(_ * 3)).get == h,
      "uniform gain must not move the energy hash")
    // silencing one window flips only comparisons touching it
    val tweaked = got.clone()
    (2 * 3 until 3 * 3).foreach(tweaked(_) = 0) // window 2 of 65 (win=3)
    val ht = Multimodal.audioEnergyHash(tweaked).get
    val hamming = java.lang.Long.bitCount(h ^ ht)
    assert(hamming <= 2, s"local edit moved $hamming bits")
    assert(Multimodal.audioEnergyHash(new Array[Int](64)).isEmpty)
    assert(Multimodal.audioEnergyHash(null).isEmpty)
  }

  test("parseGifFrames agrees with javax.imageio on frame counts") {
    (1 to 10).foreach { _ =>
      val nf = 1 + rnd.nextInt(6)
      val bytes = randomGif(nf)
      val got = Multimodal.parseGifFrames(bytes).get
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      assert(readers.hasNext, "no ImageIO GIF reader")
      val r = readers.next()
      r.setInput(in)
      assert(r.getNumImages(true) == nf, "ImageIO disagrees with the fixture")
      assert(got.nFrames == nf && got.width == 2 && got.height == 2)
      r.dispose()
    }
  }
}
