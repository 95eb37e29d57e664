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
