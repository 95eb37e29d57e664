package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Multimodal.parseImageHeader]] and [[Multimodal.describeMedia]]
  * with REAL container bytes: hand-built minimal PNG / GIF / JPEG
  * headers (inline-golden style, like the reference's embedded fixture
  * strings in hadoop-streaming's TestStreaming.java). The q33 oracle
  * only pins the text-payload path ('unknown'/null dims); these pin the
  * image branches.
  */
class MultimodalHeaderSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal valid PNG prefix: 8-byte signature + IHDR chunk header
    * with width/height as big-endian u32 at offsets 16/20. */
  private def png(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(33) // big-endian by default
    b.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    b.putInt(13).put("IHDR".getBytes("US-ASCII"))
    b.putInt(w).putInt(h)
    b.put(Array[Byte](8, 6, 0, 0, 0)) // depth, color, compression, filter, interlace
    b.array()
  }

  /** GIF89a header: magic + logical screen descriptor (w/h LE16 at 6/8). */
  private def gif(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++ Array(
      (w & 0xff).toByte, ((w >> 8) & 0xff).toByte,
      (h & 0xff).toByte, ((h >> 8) & 0xff).toByte,
      0xf7.toByte, 0.toByte, 0.toByte)

  /** JPEG: SOI, APP0 (skipped by the marker walk), then a SOFn frame
    * header carrying height/width as big-endian u16 at payload +5/+7. */
  private def jpeg(w: Int, h: Int, sofMarker: Int = 0xC0): Array[Byte] = {
    val app0 = Array(0xFF, 0xE0, 0x00, 0x10) ++ Array.fill(14)(0)
    val sof = Array(0xFF, sofMarker, 0x00, 0x11, 8,
      (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff) ++ Array.fill(10)(0)
    (Array(0xFF, 0xD8) ++ app0 ++ sof).map(_.toByte)
  }

  test("parseImageHeader reads PNG IHDR dimensions") {
    assert(Multimodal.parseImageHeader(png(640, 480)) == Some(("png", 640, 480)))
    assert(Multimodal.parseImageHeader(png(1, 1)) == Some(("png", 1, 1)))
    assert(Multimodal.parseImageHeader(png(65535, 3)) == Some(("png", 65535, 3)))
  }

  test("parseImageHeader reads the GIF logical screen descriptor (little-endian)") {
    assert(Multimodal.parseImageHeader(gif(320, 200)) == Some(("gif", 320, 200)))
    assert(Multimodal.parseImageHeader(gif(300, 1)) == Some(("gif", 300, 1))) // >255: both LE bytes used
    val gif87 = gif(12, 34); gif87(4) = '7'.toByte
    assert(Multimodal.parseImageHeader(gif87) == Some(("gif", 12, 34)))
  }

  test("parseImageHeader walks JPEG markers to the first SOF frame") {
    assert(Multimodal.parseImageHeader(jpeg(1024, 768)) == Some(("jpeg", 1024, 768)))
    // progressive (SOF2) parses the same way
    assert(Multimodal.parseImageHeader(jpeg(99, 44, sofMarker = 0xC2)) == Some(("jpeg", 99, 44)))
    // a DHT segment (C4) before the frame is skipped, not parsed as SOF
    val dht = Array(0xFF, 0xC4, 0x00, 0x04, 0, 0).map(_.toByte)
    val withDht = Array(0xFF, 0xD8).map(_.toByte) ++ dht ++ jpeg(7, 9).drop(2)
    assert(Multimodal.parseImageHeader(withDht) == Some(("jpeg", 7, 9)))
  }

  test("parseImageHeader rejects non-image and truncated payloads") {
    assert(Multimodal.parseImageHeader("plain text".getBytes) == None)
    assert(Multimodal.parseImageHeader(null) == None)
    assert(Multimodal.parseImageHeader(Array.empty[Byte]) == None)
    assert(Multimodal.parseImageHeader(png(10, 10).take(20)) == None) // < 24 bytes
    assert(Multimodal.parseImageHeader("GIF8".getBytes) == None)
    assert(Multimodal.parseImageHeader(Array(0xFF, 0xD8).map(_.toByte)) == None) // SOI only
  }

  test("describeMedia surfaces real dimensions for image payloads and nulls for text") {
    val rows = Seq(
      (1L, png(800, 600)),
      (2L, gif(64, 32)),
      (3L, jpeg(1920, 1080)),
      (4L, "just some text".getBytes("UTF-8")),
      (5L, null.asInstanceOf[Array[Byte]]))
    val media = Multimodal.asMedia(rows.toDF("id", "bytes"), "id", "bytes", "image")
    val out = Multimodal.describeMedia(media)
      .orderBy("media_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)), Option(r.get(4)), Option(r.get(5))))

    def md5hex(b: Array[Byte]) =
      java.security.MessageDigest.getInstance("MD5").digest(b).map(x => f"$x%02x").mkString

    assert(out(0) == ((1L, png(800, 600).length.toLong, md5hex(png(800, 600)),
      Some("png"), Some(800), Some(600))))
    assert(out(1) == ((2L, gif(64, 32).length.toLong, md5hex(gif(64, 32)),
      Some("gif"), Some(64), Some(32))))
    assert(out(2) == ((3L, jpeg(1920, 1080).length.toLong, md5hex(jpeg(1920, 1080)),
      Some("jpeg"), Some(1920), Some(1080))))
    assert(out(3) == ((4L, 14L, md5hex("just some text".getBytes("UTF-8")), None, None, None)))
    assert(out(4) == ((5L, 0L, md5hex(Array.empty[Byte]), None, None, None)))
  }

  // canonical 44-byte PCM WAV header + data: stereo 8 kHz 16-bit,
  // byteRate 32000; dataLen bytes of audio → dataLen*1000/32000 ms
  private def wav(dataLen: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(8000).putInt(32000).putShort(4).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    b.array()
  }

  // minimal MP4: ftyp box, then moov containing an mvhd v0 with
  // timescale 600 and duration 1200 → 2000 ms
  private def mp4(timescale: Int, duration: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(16 + 8 + 108)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    b.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0)
    b.putInt(8 + 108).put("moov".getBytes("US-ASCII"))
    b.putInt(108).put("mvhd".getBytes("US-ASCII"))
      .putInt(0)                       // version 0 + flags
      .putInt(0).putInt(0)             // ctime, mtime
      .putInt(timescale).putInt(duration)
    b.array()
  }

  test("parseAvHeader reads WAV sample rate, channels, and data-derived duration") {
    val got = Multimodal.parseAvHeader(wav(16000))
    assert(got.contains(Multimodal.AvHeader("wav", 500L, 8000, 2)), got)
  }

  test("parseAvHeader walks MP4 boxes to mvhd timescale/duration") {
    val got = Multimodal.parseAvHeader(mp4(600, 1200))
    assert(got.contains(Multimodal.AvHeader("mp4", 2000L, 600, 0)), got)
    assert(Multimodal.parseAvHeader("nonsense bytes!!".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.parseAvHeader(Array.empty[Byte]).isEmpty)
  }

  test("parseAvHeader survives truncated and hostile-size containers") {
    // truncated v1 mvhd: version byte says 64-bit times but bytes stop
    val truncated = {
      val full = mp4(600, 1200)
      full(16 + 8 + 8) = 1.toByte // mvhd version -> 1
      full.take(16 + 8 + 20)
    }
    assert(Multimodal.parseAvHeader(truncated).isEmpty)
    // hostile box size 0xFFFFFFFF: must terminate, not loop or negate
    val hostile = java.nio.ByteBuffer.allocate(24)
      .putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0)
      .putInt(0xFFFFFFFF).put("moov".getBytes("US-ASCII")).array()
    assert(Multimodal.parseAvHeader(hostile).isEmpty)
    // hostile RIFF chunk size: same property on the WAV walk
    val hostileWav = {
      val w = wav(0)
      val b = java.nio.ByteBuffer.wrap(w).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(16, 0xFFFFFFFF) // fmt chunk size -> u32 max
      w
    }
    // fmt was read before the hostile size advanced the cursor out;
    // data chunk never found -> duration 0. The property is that the
    // walk TERMINATED with the facts it had.
    assert(Multimodal.parseAvHeader(hostileWav)
      .contains(Multimodal.AvHeader("wav", 0L, 8000, 2)))
  }

  test("parseAvHeader honors size==1 largesize box headers") {
    // moov written with the 64-bit largesize form: size field 1, type,
    // then the real size as a u64 — children start 16 bytes in, not 8
    val b = java.nio.ByteBuffer.allocate(16 + 16 + 108)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    b.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0)
    b.putInt(1).put("moov".getBytes("US-ASCII")).putLong(16 + 108)
    b.putInt(108).put("mvhd".getBytes("US-ASCII"))
      .putInt(0).putInt(0).putInt(0)
      .putInt(600).putInt(1200)
    val got = Multimodal.parseAvHeader(b.array())
    assert(got.contains(Multimodal.AvHeader("mp4", 2000L, 600, 0)), got)
    // size==1 with the largesize bytes missing: must terminate cleanly
    assert(Multimodal.parseAvHeader(b.array().take(30)).isEmpty)
  }

  test("describeAv reports container facts per payload, nulls for unknown") {
    val rows = Seq((1L, wav(32000)), (2L, mp4(600, 600)),
      (3L, "not media".getBytes("UTF-8")))
    val media = Multimodal.asMedia(rows.toDF("id", "bytes"), "id", "bytes", "av")
    val out = Multimodal.describeAv(media).orderBy("media_id")
      .as[(Long, Long, Option[String], Option[Long], Option[Int], Option[Int])]
      .collect().toSeq
    assert(out(0) == ((1L, 44L + 32000L, Some("wav"), Some(1000L), Some(8000), Some(2))))
    assert(out(1) == ((2L, 132L, Some("mp4"), Some(1000L), Some(600), Some(0))))
    assert(out(2) == ((3L, 9L, None, None, None, None)))
  }

  // PCM WAV with explicit format fields and raw sample bytes; the
  // declared data size can lie (truncated-upload fixture)
  private def wavPcm(fmtCode: Int, ch: Int, rate: Int, bits: Int,
                     data: Array[Byte], declaredLen: Int = -1): Array[Byte] = {
    val blockAlign = bits / 8 * ch
    val b = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(fmtCode.toShort).putShort(ch.toShort).putInt(rate)
      .putInt(rate * blockAlign).putShort(blockAlign.toShort).putShort(bits.toShort)
      .put("data".getBytes("US-ASCII"))
      .putInt(if (declaredLen >= 0) declaredLen else data.length)
      .put(data)
    b.array()
  }
  private def le16bytes(ss: Seq[Int]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(ss.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    ss.foreach(s => b.putShort(s.toShort)); b.array()
  }

  test("parseWavPcm decodes 16-bit samples: exact peak/rms of a half-scale square wave") {
    // 8 frames of ±16384 (= ±0.5 of full scale): peak and rms both 0.5
    val data = le16bytes(Seq(16384, -16384, 16384, -16384, 16384, -16384, 16384, -16384))
    val st = Multimodal.parseWavPcm(wavPcm(1, 1, 8000, 16, data)).get
    // raw 16-bit-unit stats ride along: peak 16384, Σs² = 8·16384²
    assert(st == Multimodal.PcmStats(8000, 1, 16, 8L, 1L, 0.5, 0.5,
      16384L, 8L * 16384 * 16384))
  }

  test("parseWavPcm decodes 8-bit (unsigned, bias 128) and 24-bit (signed LE) samples") {
    // 8-bit samples {128, 0} → amplitudes {0, -1}: peak 1, rms √½
    val st8 = Multimodal.parseWavPcm(
      wavPcm(1, 1, 1000, 8, Array[Byte](128.toByte, 0))).get
    assert(st8.bitsPerSample == 8 && st8.nFrames == 2 && st8.peak == 1.0)
    assert(math.abs(st8.rms - math.sqrt(0.5)) < 1e-12)
    // 24-bit: full-scale negative 0x800000 then silence
    val st24 = Multimodal.parseWavPcm(wavPcm(1, 1, 1000, 24,
      Array[Byte](0, 0, 0x80.toByte, 0, 0, 0))).get
    assert(st24.bitsPerSample == 24 && st24.nFrames == 2 && st24.peak == 1.0)
    assert(math.abs(st24.rms - math.sqrt(0.5)) < 1e-12)
  }

  test("parseWavPcm counts stereo FRAMES and clamps a lying data size to the bytes present") {
    // 16-bit stereo, 4 frames (16 bytes), 1 kHz → 4 ms
    val stereo = Multimodal.parseWavPcm(
      wavPcm(1, 2, 1000, 16, le16bytes(Seq.fill(8)(0)))).get
    assert(stereo.channels == 2 && stereo.nFrames == 4L && stereo.durationMs == 4L)
    // declared 1000 data bytes, only 4 frames present: stats cover
    // what's there, duration derives from DECODED frames
    val trunc = Multimodal.parseWavPcm(
      wavPcm(1, 1, 1000, 16, le16bytes(Seq.fill(4)(8192)), declaredLen = 1000)).get
    assert(trunc.nFrames == 4L && trunc.durationMs == 4L && trunc.peak == 0.25)
  }

  test("parseWavPcm refuses what needs a real codec and survives hostile bytes") {
    val d = le16bytes(Seq(1, 2))
    assert(Multimodal.parseWavPcm(wavPcm(3, 1, 8000, 16, d)).isEmpty, "float fmt")
    assert(Multimodal.parseWavPcm(wavPcm(0xFFFE, 1, 8000, 16, d)).isEmpty, "extensible")
    assert(Multimodal.parseWavPcm(wavPcm(1, 1, 8000, 12, d)).isEmpty, "12-bit")
    assert(Multimodal.parseWavPcm(wavPcm(1, 0, 8000, 16, d)).isEmpty, "0 channels")
    assert(Multimodal.parseWavPcm("not audio".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.parseWavPcm(null).isEmpty)
    assert(Multimodal.parseWavPcm(wavPcm(1, 1, 8000, 16, d).take(30)).isEmpty,
      "truncated before the data chunk")
  }

  // 24bpp BMP with explicit pixels: `rows` is top row first, each
  // pixel (r, g, b); written bottom-up unless topDown
  private def bmp(rows: Seq[Seq[(Int, Int, Int)]], topDown: Boolean = false): Array[Byte] = {
    val h = rows.length; val w = rows.head.length
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val b = java.nio.ByteBuffer.allocate(54 + rowBytes * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + rowBytes * h)
      .putShort(0).putShort(0).putInt(54)
    b.putInt(40).putInt(w).putInt(if (topDown) -h else h).putShort(1).putShort(24)
      .putInt(0).putInt(rowBytes * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    val fileRows = if (topDown) rows else rows.reverse
    fileRows.foreach { r =>
      r.foreach { case (red, g, blue) =>
        b.put(blue.toByte).put(g.toByte).put(red.toByte)
      }
      (w * 3 until rowBytes).foreach(_ => b.put(0.toByte))
    }
    b.array()
  }

  test("parseBmpPixels sums channels exactly through padding and bottom-up rows") {
    // 2x2: w*3 = 6 bytes/row pads to 8 — the padding bytes must NOT
    // be counted as pixels
    val img = Seq(
      Seq((10, 20, 30), (40, 50, 60)),
      Seq((1, 2, 3), (200, 100, 0)))
    val st = Multimodal.parseBmpPixels(bmp(img)).get
    assert(st == Multimodal.BmpStats(2, 2, 24, 4L, 251L, 172L, 93L))
    // top-down (negative height): same sums, same reported dims
    assert(Multimodal.parseBmpPixels(bmp(img, topDown = true)).get == st)
  }

  test("parseBmpPixels clamps truncated pixel data and refuses non-24bpp/compressed") {
    val full = bmp(Seq(Seq((255, 255, 255), (255, 255, 255))))
    // cut mid-second-pixel: only 1 fully-present pixel counts
    val st = Multimodal.parseBmpPixels(full.take(54 + 4)).get
    assert(st.nPixels == 1L && st.sumR == 255L)
    // 8bpp (palette) and BI_RLE8 compression are a different tier
    val pal = full.clone(); pal(28) = 8; assert(Multimodal.parseBmpPixels(pal).isEmpty)
    val rle = full.clone(); rle(30) = 1; assert(Multimodal.parseBmpPixels(rle).isEmpty)
    assert(Multimodal.parseBmpPixels("BMnot really".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.parseBmpPixels(null).isEmpty)
    // hostile width near 2^31: Int row-stride math would overflow
    // negative and crash on a negative array index; must clamp clean.
    // Hostile height likewise must not spin 2^31 empty rows.
    val evil = bmp(Seq(Seq((1, 2, 3)))).clone()
    val bb = java.nio.ByteBuffer.wrap(evil).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(18, 0x7ffffff0)                       // width
    val stEvil = Multimodal.parseBmpPixels(evil).get
    assert(stEvil.width == 0x7ffffff0 && stEvil.nPixels <= 2)
    val tall = bmp(Seq(Seq((1, 2, 3)))).clone()
    java.nio.ByteBuffer.wrap(tall).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, Int.MaxValue)                     // height
    val stTall = Multimodal.parseBmpPixels(tall).get // returns promptly
    assert(stTall.nPixels == 1L)
  }

  test("parseImageHeader reads BITMAPCOREHEADER (dib=12) u16 dims") {
    // The v2 core header stores width/height as LE u16 at 18/20 (not
    // the s32@18/22 of every later header) — a 640x480 core-header BMP
    // must not report garbage packed dims.
    val b = java.nio.ByteBuffer.allocate(26).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(26).putInt(0).putInt(26)
    b.putInt(12) // DIB size: BITMAPCOREHEADER
    b.putShort(640.toShort).putShort(480.toShort) // u16 width/height
    b.putShort(1.toShort).putShort(24.toShort)    // planes, bpp
    assert(Multimodal.parseImageHeader(b.array()) == Some(("bmp", 640, 480)))
  }

  test("describePcm rounds half-away-from-zero (repo ROUND convention)") {
    // 256/32768 = 0.0078125 sits exactly on the 1e-6 midpoint:
    // HALF_UP gives 0.007813 (matching Spark round / DuckDB ROUND);
    // rint's half-even would give 0.007812.
    val rows = Seq((1L, wavPcm(1, 1, 8000, 16, le16bytes(Seq.fill(4)(256)))))
    val out = Multimodal.describePcm(
        Multimodal.asMedia(rows.toDF("id", "bytes"), "id", "bytes", "audio"))
      .select("peak", "rms").as[(Option[Double], Option[Double])].collect()
    assert(out.head == ((Some(0.007813), Some(0.007813))))
  }

  test("parseImageHeader recognizes BMP dimensions (incl. top-down)") {
    val img = Seq(Seq((1, 2, 3), (4, 5, 6), (7, 8, 9)))
    assert(Multimodal.parseImageHeader(bmp(img)) == Some(("bmp", 3, 1)))
    assert(Multimodal.parseImageHeader(bmp(img, topDown = true)) == Some(("bmp", 3, 1)))
  }

  // minimal animated GIF: `delays` in 1/100 s, one 1x1 frame each,
  // optional global color table, garbage LZW data the walker must skip
  private def gif(delays: Seq[Int], gct: Boolean = false,
                  localCt: Boolean = false): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    def b(x: Int): Unit = bb.write(x & 0xff)
    "GIF89a".getBytes("US-ASCII").foreach(bb.write(_))
    b(1); b(0); b(1); b(0)
    b(if (gct) 0x80 else 0) // GCT flag, size bits 0 -> 2 entries
    b(0); b(0)
    if (gct) (0 until 6).foreach(_ => b(0x11)) // 3 * 2^1 bytes
    delays.foreach { d =>
      b(0x21); b(0xf9); b(4); b(0); b(d); b(d >> 8); b(0); b(0)
      b(0x2c); b(0); b(0); b(0); b(0); b(1); b(0); b(1); b(0)
      b(if (localCt) 0x80 else 0)
      if (localCt) (0 until 6).foreach(_ => b(0x22))
      b(2); b(2); b(0xde); b(0xad); b(0) // LZW min + garbage + term
    }
    b(0x3b)
    bb.toByteArray
  }

  test("parseGifFrames counts frames and sums GCE delays through color tables") {
    assert(Multimodal.parseGifFrames(gif(Seq(10, 25, 7))) ==
      Some(Multimodal.GifFrames(1, 1, 3, 420L)))
    // global AND local color tables must be skipped, not misread as blocks
    assert(Multimodal.parseGifFrames(gif(Seq(50), gct = true, localCt = true)) ==
      Some(Multimodal.GifFrames(1, 1, 1, 500L)))
    // a comment extension between frames is skipped via sub-blocks
    val withComment = {
      val base = gif(Seq(10, 10))
      val out = new java.io.ByteArrayOutputStream()
      out.write(base, 0, 13) // header + LSD
      out.write(Array[Byte](0x21, 0xfe.toByte, 3, 'h', 'i', '!', 0)) // comment
      out.write(base, 13, base.length - 13)
      out.toByteArray
    }
    assert(Multimodal.parseGifFrames(withComment).get.nFrames == 2)
  }

  test("parseGifFrames clamps truncation to fully-present frames and rejects non-GIF") {
    val full = gif(Seq(10, 10, 10))
    // cut inside the third frame's data: two complete frames remain
    val cut = full.take(full.length - 4)
    val st = Multimodal.parseGifFrames(cut).get
    assert(st.nFrames == 2 && st.durationMs == 200L, st.toString)
    assert(Multimodal.parseGifFrames("GIF9".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.parseGifFrames(null).isEmpty)
    // corrupt block tag: stop cleanly, keep frames parsed so far
    val corrupt = full.clone()
    corrupt(13) = 0x7f // first block tag -> garbage
    assert(Multimodal.parseGifFrames(corrupt).get.nFrames == 0)
  }

  test("describePcm surfaces decoded stats per payload, nulls for non-PCM") {
    val rows = Seq(
      (1L, wavPcm(1, 1, 8000, 16, le16bytes(Seq.fill(8)(16384)))),
      (2L, "not media".getBytes("UTF-8")))
    val media = Multimodal.asMedia(rows.toDF("id", "bytes"), "id", "bytes", "audio")
    val out = Multimodal.describePcm(media).orderBy("media_id")
      .as[(Long, Option[Int], Option[Int], Option[Int], Option[Long],
           Option[Long], Option[Double], Option[Double])].collect().toSeq
    assert(out(0) == ((1L, Some(8000), Some(1), Some(16), Some(8L), Some(1L),
      Some(0.5), Some(0.5))))
    assert(out(1) == ((2L, None, None, None, None, None, None, None)))
  }

  // ---- MP4 per-track walk + AVI main header ----------------------

  // independent box builder (big-endian size + fourcc + content)
  private def box(name: String, parts: Array[Byte]*): Array[Byte] = {
    val content = parts.flatten.toArray
    val b = java.nio.ByteBuffer.allocate(8 + content.length)
    b.putInt(8 + content.length).put(name.getBytes("US-ASCII")).put(content)
    b.array()
  }
  private def ints(vs: Int*): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(4 * vs.length)
    vs.foreach(b.putInt); b.array()
  }
  private def trak(tid: Int, v1: Boolean, handler: String, codec: String,
                   w: Int, h: Int, ns: Int, ts: Int, dur: Int): Array[Byte] = {
    val matrix = ints(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    val tkhd =
      if (v1) box("tkhd", ints(0x01000000, 0, 0, 0, 0, tid, 0, 0, 0, 0, 0),
        ints(0, 0), matrix, ints(w << 16, h << 16))
      else box("tkhd", ints(0, 0, 0, tid, 0, 0), ints(0, 0), ints(0, 0),
        matrix, ints(w << 16, h << 16))
    val mdhd =
      if (v1) box("mdhd", ints(0x01000000, 0, 0, 0, 0, ts, 0, dur), ints(0))
      else box("mdhd", ints(0, 0, 0, ts, dur), ints(0))
    val hdlr = box("hdlr", ints(0, 0), handler.getBytes("US-ASCII"),
      ints(0, 0, 0), Array(0.toByte))
    val stsd = box("stsd", ints(0, 1), ints(16), codec.getBytes("US-ASCII"),
      ints(0, 0))
    val stsz = box("stsz", ints(0, 0, ns))
    box("trak", tkhd, box("mdia", mdhd, hdlr, box("minf", box("stbl", stsd, stsz))))
  }
  private def mp4File(traks: Array[Byte]*): Array[Byte] =
    box("ftyp", "isom".getBytes("US-ASCII"), ints(0)) ++
      box("moov", traks.flatten.toArray)

  test("parseMp4Tracks walks v0 AND v1 trak boxes to dims/codec/samples") {
    val f = mp4File(
      trak(1, v1 = false, "vide", "avc1", 640, 360, 240, 12800, 512 * 240),
      trak(2, v1 = true, "soun", "mp4a", 0, 0, 480, 48000, 48000 * 10))
    val got = Multimodal.parseMp4Tracks(f).get
    assert(got == Seq(
      Multimodal.Mp4Track(1, "vide", "avc1", 640, 360, 240, 240 * 40),
      Multimodal.Mp4Track(2, "soun", "mp4a", 0, 0, 480, 10000)))
    assert(Multimodal.parseMp4Tracks("no ftyp here!!!!".getBytes).isEmpty)
    assert(Multimodal.parseMp4Tracks(null).isEmpty)
    // 64-bit largesize moov header: same tracks behind a 16-byte header
    val inner = trak(7, v1 = false, "vide", "hvc1", 320, 240, 60, 1000, 2500)
    val bb = java.nio.ByteBuffer.allocate(16 + inner.length)
    bb.putInt(1).put("moov".getBytes("US-ASCII"))
      .putLong(16L + inner.length).put(inner)
    val f2 = box("ftyp", "isom".getBytes("US-ASCII"), ints(0)) ++ bb.array()
    assert(Multimodal.parseMp4Tracks(f2).get ==
      Seq(Multimodal.Mp4Track(7, "vide", "hvc1", 320, 240, 60, 2500)))
  }

  test("parseAviHeader reads avih through word-aligned chunk walks") {
    def avi(w: Int, h: Int, frames: Int, usf: Int, streams: Int,
            junkLen: Int): Array[Byte] = {
      val junk = if (junkLen > 0) {
        val b = java.nio.ByteBuffer.allocate(8 + junkLen + (junkLen & 1))
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put("JUNK".getBytes("US-ASCII")).putInt(junkLen)
        b.array()
      } else Array.empty[Byte]
      val b = java.nio.ByteBuffer.allocate(12 + junk.length + 12 + 8 + 56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(4 + junk.length + 12 + 8 + 56)
        .put("AVI ".getBytes("US-ASCII")).put(junk)
      b.put("LIST".getBytes("US-ASCII")).putInt(68)
        .put("hdrl".getBytes("US-ASCII"))
      b.put("avih".getBytes("US-ASCII")).putInt(56)
      b.putInt(usf).putInt(0).putInt(0).putInt(0)
        .putInt(frames).putInt(0).putInt(streams).putInt(0)
        .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
      b.array()
    }
    // odd-length leading chunk exercises the word-align advance
    Seq(0, 7, 8).foreach { j =>
      val got = Multimodal.parseAviHeader(avi(640, 480, 300, 33367, 2, j)).get
      assert(got == Multimodal.AviHeader(640, 480, 300, 33367, 2,
        300L * 33367 / 1000), s"junk=$j")
    }
    assert(Multimodal.parseAviHeader(avi(1, 1, 1, 1, 1, 0).take(30)).isEmpty)
    assert(Multimodal.parseAviHeader("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.parseAviHeader(null).isEmpty)
  }

  test("parseMp4Tracks/parseAviHeader survive hostile and truncated bytes") {
    val rnd = new scala.util.Random(77)
    val seeds = Seq(
      mp4File(trak(1, v1 = false, "vide", "avc1", 64, 64, 10, 1000, 1000)),
      {
        val b = java.nio.ByteBuffer.allocate(88).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put("RIFF".getBytes).putInt(80).put("AVI ".getBytes)
          .put("LIST".getBytes).putInt(68).put("hdrl".getBytes)
          .put("avih".getBytes).putInt(56)
        (0 until 14).foreach(_ => b.putInt(rnd.nextInt()))
        b.array()
      })
    seeds.foreach { seed =>
      (1 to 300).foreach { k =>
        val c = seed.clone()
        (0 to k % 4).foreach(_ => c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte)
        Multimodal.parseMp4Tracks(c); Multimodal.parseAviHeader(c) // never a throw
      }
      (1 until seed.length).foreach { n =>
        Multimodal.parseMp4Tracks(seed.take(n))
        Multimodal.parseAviHeader(seed.take(n))
      }
    }
  }

  // independent EBML builder (supports 1- and 2-byte sizes and the
  // all-ones unknown size)
  private def ebml(id: Array[Byte], content: Array[Byte],
                   unknownSize: Boolean = false): Array[Byte] = {
    val size =
      if (unknownSize) Array(0xff.toByte)
      else if (content.length < 127) Array((0x80 | content.length).toByte)
      else Array((0x40 | (content.length >> 8)).toByte,
        (content.length & 0xff).toByte)
    id ++ size ++ content
  }
  private def eid(bs: Int*) = bs.map(_.toByte).toArray
  private def ebmlU(v: Long, n: Int): Array[Byte] =
    ((n - 1) to 0 by -1).map(k => ((v >> (8 * k)) & 0xff).toByte).toArray

  test("parseMkvTracks walks EBML to doctype, duration, and track dims") {
    def entry(num: Int, ttype: Int, codec: String, w: Int, h: Int) =
      ebml(eid(0xae),
        ebml(eid(0xd7), ebmlU(num, 1)) ++ ebml(eid(0x83), ebmlU(ttype, 1)) ++
          ebml(eid(0x86), codec.getBytes("US-ASCII")) ++
          (if (ttype == 1)
            ebml(eid(0xe0), ebml(eid(0xb0), ebmlU(w, 2)) ++
              ebml(eid(0xba), ebmlU(h, 2)))
          else Array.empty[Byte]))
    def file(doc: String, durMs: Int, unknownSeg: Boolean,
             eightByteDur: Boolean = false) = {
      val dur =
        if (eightByteDur)
          ebml(eid(0x44, 0x89),
            ebmlU(java.lang.Double.doubleToLongBits(durMs.toDouble), 8))
        else ebml(eid(0x44, 0x89),
          ebmlU(java.lang.Float.floatToIntBits(durMs.toFloat) & 0xffffffffL, 4))
      val info = ebml(eid(0x15, 0x49, 0xa9, 0x66),
        ebml(eid(0x2a, 0xd7, 0xb1), ebmlU(1000000L, 3)) ++ dur)
      val tracks = ebml(eid(0x16, 0x54, 0xae, 0x6b),
        entry(1, 1, "V_VP9", 1920, 1080) ++ entry(2, 2, "A_OPUS", 0, 0))
      ebml(eid(0x1a, 0x45, 0xdf, 0xa3),
        ebml(eid(0x42, 0x82), doc.getBytes("US-ASCII"))) ++
        ebml(eid(0x18, 0x53, 0x80, 0x67), info ++ tracks,
          unknownSize = unknownSeg)
    }
    Seq((false, false), (true, false), (false, true)).foreach {
      case (unk, dur8) =>
        val (doc, tracks) = Multimodal.parseMkvTracks(
          file("webm", 2500, unk, dur8)).get
        assert(doc == "webm", s"unk=$unk dur8=$dur8")
        assert(tracks == Seq(
          Multimodal.Mp4Track(1, "vide", "V_VP9", 1920, 1080, 0, 2500),
          Multimodal.Mp4Track(2, "soun", "A_OPUS", 0, 0, 0, 2500)))
    }
    assert(Multimodal.parseMkvTracks(
      file("matroska", 10, unknownSeg = false)).get._1 == "matroska")
    assert(Multimodal.parseMkvTracks("not ebml at all".getBytes).isEmpty)
    assert(Multimodal.parseMkvTracks(null).isEmpty)
    // hostile: truncation sweep + random corruption never throw
    val seed = file("webm", 2500, unknownSeg = false)
    (1 until seed.length).foreach(n => Multimodal.parseMkvTracks(seed.take(n)))
    val rnd = new scala.util.Random(99)
    (1 to 300).foreach { k =>
      val c = seed.clone()
      (0 to k % 4).foreach(_ => c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte)
      Multimodal.parseMkvTracks(c)
    }
  }

  test("parseExif reads both byte orders, APP1 and bare TIFF, and survives fuzz") {
    // big-endian bare TIFF: IFD0 {Orientation, ExifIFD} + Exif {PixelX/Y}
    def beTiff(orientation: Int, px: Int, py: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + 2 + 2 * 12 + 4 + 2 + 2 * 12 + 4)
      bb.put('M'.toByte).put('M'.toByte).putShort(42).putInt(8)
      bb.putShort(2)
      bb.putShort(274).putShort(3).putInt(1).putShort(orientation.toShort).putShort(0)
      bb.putShort(0x8769.toShort).putShort(4).putInt(1).putInt(8 + 2 + 2 * 12 + 4)
      bb.putInt(0)
      bb.putShort(2)
      bb.putShort(0xa002.toShort).putShort(4).putInt(1).putInt(px)
      bb.putShort(0xa003.toShort).putShort(4).putInt(1).putInt(py)
      bb.putInt(0)
      bb.array()
    }
    val be = Multimodal.parseExif(beTiff(6, 320, 240)).get
    assert(be == Multimodal.ExifInfo(6, "", "", "", 320, 240))
    // little-endian inside a JPEG APP1 after SOI + APP0
    val le = {
      val t = beTiff(1, 64, 48)
      // rewrite as LE via the known layout is tedious — test the JPEG
      // wrapper with the BE stream instead (EXIF allows either order)
      val app1 = java.nio.ByteBuffer.allocate(4 + 6 + t.length)
      app1.putShort(0xffe1.toShort).putShort((2 + 6 + t.length).toShort)
        .put("Exif".getBytes("US-ASCII")).put(0.toByte).put(0.toByte).put(t)
      val app0 = Array[Byte](0xff.toByte, 0xe0.toByte, 0, 4, 'J', 'F')
      Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ app1.array() ++
        Array[Byte](0xff.toByte, 0xd9.toByte)
    }
    assert(Multimodal.parseExif(le).get ==
      Multimodal.ExifInfo(1, "", "", "", 64, 48))
    // refusals: no EXIF anywhere, junk, null
    assert(Multimodal.parseExif(Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xd9.toByte)).isEmpty)
    assert(Multimodal.parseExif("plain text".getBytes).isEmpty)
    assert(Multimodal.parseExif(null).isEmpty)
    // truncation sweep + random corruption never throw
    val seed = le
    (1 until seed.length).foreach(n => Multimodal.parseExif(seed.take(n)))
    val rnd = new scala.util.Random(55)
    (1 to 300).foreach { k =>
      val c = seed.clone()
      (0 to k % 4).foreach(_ => c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte)
      Multimodal.parseExif(c)
    }
  }

  // hand-built MPEG audio frames: header + computed-length body
  private def mp3Frames(b1: Int, b2: Int, b3: Int, frameLen: Int,
                        n: Int, id3Len: Int = 0): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    if (id3Len > 0) {
      Seq('I'.toInt, 'D'.toInt, '3'.toInt, 4, 0, 0, 0, 0,
        (id3Len >> 7) & 0x7f, id3Len & 0x7f).foreach(bos.write)
      (0 until id3Len).foreach(_ => bos.write(0xab))
    }
    (0 until n).foreach { f =>
      bos.write(0xff); bos.write(b1); bos.write(b2); bos.write(b3)
      (4 until frameLen).foreach(k => bos.write((f + k) % 256))
    }
    bos.toByteArray
  }

  test("parseMp3 walks frames across versions, layers, padding, and ID3") {
    // MPEG1 Layer III 128 kbps @ 44.1 kHz stereo: 417-byte frames (no
    // pad) — duration floor(n*1152*1000/44100)
    val l3 = Multimodal.parseMp3(mp3Frames(0xfb, (9 << 4) | 0, 0, 417, 7)).get
    assert(l3 == Multimodal.Mp3Info(1, 3, 128, 44100, 2, 7,
      7L * 1152 * 1000 / 44100))
    // padding bit lengthens the frame by 1
    val pad = Multimodal.parseMp3(mp3Frames(0xfb, (9 << 4) | 2, 0, 418, 3)).get
    assert(pad.nFrames == 3)
    // MPEG2 Layer III @ 16 kHz mono, 64 kbps: 72*64000/16000 = 288
    val m2 = Multimodal.parseMp3(mp3Frames(0xf3, (8 << 4) | 8, 0xc0, 288, 5)).get
    assert(m2 == Multimodal.Mp3Info(2, 3, 64, 16000, 1, 5,
      5L * 576 * 1000 / 16000))
    // MPEG1 Layer I 256 kbps @ 32 kHz: (12*256000/32000)*4 = 384, spf 384
    val l1 = Multimodal.parseMp3(mp3Frames(0xff, (8 << 4) | 8, 0, 384, 4)).get
    assert(l1 == Multimodal.Mp3Info(1, 1, 256, 32000, 2, 4, 4L * 384 * 1000 / 32000))
    // ID3v2 prefix skipped; trailing junk after the last frame tolerated
    val id3 = Multimodal.parseMp3(
      mp3Frames(0xfb, (9 << 4) | 0, 0, 417, 2, id3Len = 99) ++
        "trailing garbage".getBytes).get
    assert(id3.nFrames == 2)
    // refusals: free-format (brIdx 0), reserved rate, junk, null
    assert(Multimodal.parseMp3(mp3Frames(0xfb, 0, 0, 417, 1)).isEmpty)
    assert(Multimodal.parseMp3(mp3Frames(0xfb, (9 << 4) | 12, 0, 417, 1)).isEmpty)
    assert(Multimodal.parseMp3("not mp3".getBytes).isEmpty)
    assert(Multimodal.parseMp3(null).isEmpty)
    // maxFrames fence
    assert(Multimodal.parseMp3(mp3Frames(0xfb, (9 << 4) | 0, 0, 417, 10),
      maxFrames = 4).get.nFrames == 4)
    // truncation sweep + corruption never throw
    val seed = mp3Frames(0xfb, (9 << 4) | 0, 0, 417, 3, id3Len = 20)
    (1 until seed.length).foreach(n => Multimodal.parseMp3(seed.take(n)))
    val rnd = new scala.util.Random(31)
    (1 to 300).foreach { k =>
      val c = seed.clone()
      (0 to k % 4).foreach(_ => c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte)
      Multimodal.parseMp3(c)
    }
  }

  // hand-built RIFF AVI: avih + per-stream strl list + movi chunks
  private def aviOf(vidsCompression: Array[Byte], w: Int, h: Int,
                    chunks: Seq[(String, Array[Byte])],
                    audioFirst: Boolean = false,
                    recWrap: Boolean = false): Array[Byte] = {
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def ck(id: String, p: Array[Byte]) = id.getBytes("US-ASCII") ++
      le32(p.length) ++ p ++ (if ((p.length & 1) == 1) Array[Byte](0) else Array[Byte]())
    def li(kind: String, b: Array[Byte]) = ck("LIST", kind.getBytes("US-ASCII") ++ b)
    val avih = ck("avih", le32(40000) ++ Array.fill(12)(0.toByte) ++
      le32(chunks.size) ++ le32(0) ++ le32(if (audioFirst) 2 else 1) ++
      le32(0) ++ le32(w) ++ le32(h) ++ Array.fill(16)(0.toByte))
    def strh(t: String) = ck("strh",
      t.getBytes("US-ASCII") ++ "xxxx".getBytes ++ Array.fill(48)(0.toByte))
    val strfV = ck("strf", le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++
      le16(24) ++ vidsCompression ++ Array.fill(16)(0.toByte))
    val strlV = li("strl", strh("vids") ++ strfV)
    val strlA = li("strl", strh("auds") ++ ck("strf", Array.fill(16)(0.toByte)))
    val hdrl = li("hdrl", avih ++ (if (audioFirst) strlA ++ strlV else strlV))
    val frames = chunks.flatMap { case (tag, b) => ck(tag, b) }.toArray
    val movi = li("movi", if (recWrap) li("rec ", frames) else frames)
    ck("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi)
  }

  test("parseAviFrames decodes MJPEG and DIB streams, routes by stream index") {
    // MJPEG: real ImageIO-encoded JPEG frames; the container walk must
    // agree with direct parseJpegPixels on the same frame bytes
    val jf = (0 until 3).map { f =>
      val img = new java.awt.image.BufferedImage(32, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 16).foreach(y => (0 until 32).foreach(x =>
        img.setRGB(x, y, ((x * 8 + f * 40) % 256) * 0x010101)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpeg", bos)
      bos.toByteArray
    }
    val mj = Multimodal.parseAviFrames(
      aviOf("MJPG".getBytes("US-ASCII"), 32, 16,
        jf.map(("00dc", _)))).get
    assert(mj.size == 3)
    mj.zipWithIndex.foreach { case (fr, k) =>
      val direct = Multimodal.parseJpegPixels(jf(k)).get
      assert(fr == Multimodal.VideoFrame(k, "mjpeg", 32, 16, 512,
        direct.sumR, direct.sumG, direct.sumB))
    }
    // audioFirst: video is stream 1 → 01dc; 00-tagged chunks ignored
    val routed = Multimodal.parseAviFrames(
      aviOf("MJPG".getBytes("US-ASCII"), 32, 16,
        Seq(("00wb", Array.fill(10)(7.toByte)), ("01dc", jf(0)),
            ("00wb", Array.fill(4)(9.toByte)), ("01dc", jf(1))),
        audioFirst = true)).get
    assert(routed.size == 2 && routed.map(_.frameIdx) == Seq(0, 1))
    // rec -grouped chunks walk too
    assert(Multimodal.parseAviFrames(
      aviOf("MJPG".getBytes("US-ASCII"), 32, 16, jf.map(("00dc", _)),
        recWrap = true)).get.size == 3)
    // a corrupt middle frame is skipped, the rest still decode
    val bad = jf.updated(1, jf(1).take(20))
    val skipped = Multimodal.parseAviFrames(
      aviOf("MJPG".getBytes("US-ASCII"), 32, 16, bad.map(("00dc", _)))).get
    assert(skipped.size == 2 && skipped.map(_.sumR) ==
      Seq(mj(0).sumR, mj(2).sumR))
    // DIB: 3×2 24bpp bottom-up rows padded to 4 bytes — exact sums
    val w = 3; val h = 2
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val dib = new Array[Byte](rowBytes * h)
    (0 until h).foreach(r => (0 until w).foreach { x =>
      val o = r * rowBytes + x * 3
      dib(o) = (10 + x + r).toByte; dib(o + 1) = (20 + x).toByte
      dib(o + 2) = (30 + r).toByte
    })
    val dr = Multimodal.parseAviFrames(
      aviOf(Array[Byte](0, 0, 0, 0), w, h, Seq(("00db", dib)))).get
    assert(dr == Seq(Multimodal.VideoFrame(0, "dib", 3, 2, 6,
      6 * 30 + 3 * 1, 6 * 20 + 2 * 3, 6 * 10 + 2 * 3 + 3 * 1)))
    // maxFrames fence
    assert(Multimodal.parseAviFrames(
      aviOf("MJPG".getBytes("US-ASCII"), 32, 16, jf.map(("00dc", _))),
      maxFrames = 2).get.size == 2)
    // refusals: unknown codec fourcc, no vids stream, junk, null
    assert(Multimodal.parseAviFrames(
      aviOf("H264".getBytes("US-ASCII"), 32, 16, jf.map(("00dc", _)))).isEmpty)
    assert(Multimodal.parseAviFrames("RIFFxxxxAVI LISThdrl".getBytes).isEmpty)
    assert(Multimodal.parseAviFrames("not avi".getBytes).isEmpty)
    assert(Multimodal.parseAviFrames(null).isEmpty)
    // truncation sweep + corruption never throw
    val seed = aviOf("MJPG".getBytes("US-ASCII"), 32, 16,
      Seq(("00dc", jf(0)), ("00dc", jf(1))))
    (1 until seed.length).foreach(n => Multimodal.parseAviFrames(seed.take(n)))
    val rnd = new scala.util.Random(58)
    (1 to 300).foreach { k =>
      val c = seed.clone()
      (0 to k % 4).foreach(_ => c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte)
      Multimodal.parseAviFrames(c)
    }
  }

  /** Playable MP4 with REAL sample tables: ftyp + mdat(samples) +
    * moov{vide trak with stsd(codec) + stsz/stsc/stco}; chunking as
    * given (sample counts per chunk). */
  private def mp4Samples(codec: String, w: Int, h: Int,
                         frames: Seq[Array[Byte]],
                         chunkSizes: Seq[Int]): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), ints(0))
    val mdat = box("mdat", frames.flatMap(_.toSeq).toArray)
    val mdatStart = ftyp.length + 8
    val sampleOffs = frames.map(_.length).scanLeft(mdatStart)(_ + _).init
    val chunkFirst = chunkSizes.scanLeft(0)(_ + _).init
    val chunkOffs = chunkFirst.map(sampleOffs)
    val stscRuns = chunkSizes.zipWithIndex
      .filter { case (n, i) => i == 0 || chunkSizes(i - 1) != n }
      .map { case (n, i) => (i + 1, n) }
    val tkhd = box("tkhd", ints(0, 0, 0, 1, 0, 0, 0, 0, 0, 0,
      0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000, w << 16, h << 16))
    val mdhd = box("mdhd", ints(0, 0, 0, 1000, 100 * frames.size, 0))
    val hdlr = box("hdlr", ints(0, 0), "vide".getBytes("US-ASCII"),
      ints(0, 0, 0), Array(0.toByte))
    val stsd = box("stsd", ints(0, 1, 16), codec.getBytes("US-ASCII"), ints(0, 0))
    val stsz = box("stsz", ints((Seq(0, 0, frames.size) ++ frames.map(_.length)): _*))
    val stsc = box("stsc", ints((Seq(0, stscRuns.size) ++
      stscRuns.flatMap { case (fc, n) => Seq(fc, n, 1) }): _*))
    val stco = box("stco", ints((Seq(0, chunkOffs.size) ++ chunkOffs): _*))
    ftyp ++ mdat ++ box("moov",
      box("trak", tkhd, box("mdia", mdhd, hdlr,
        box("minf", box("stbl", stsd, stsz, stsc, stco)))))
  }

  test("parseMp4Frames: sample-table walk matches the AVI path on identical frames") {
    val jf = (0 until 5).map { f =>
      val img = new java.awt.image.BufferedImage(32, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 16).foreach(y => (0 until 32).foreach(x =>
        img.setRGB(x, y, ((x * 8 + f * 40 + y) % 256) * 0x010101)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpeg", bos)
      bos.toByteArray
    }
    // DIFFERENTIAL vs the AVI path: the same frame bytes through both
    // containers must decode to the same per-frame rows
    val viaAvi = Multimodal.parseAviFrames(
      aviOf("MJPG".getBytes("US-ASCII"), 32, 16, jf.map(("00dc", _)))).get
    val single = Multimodal.parseMp4Frames(
      mp4Samples("jpeg", 32, 16, jf, Seq(jf.size))).get
    assert(single == viaAvi)
    // multi-chunk layout (2+2+1) walks the stsc runs to the same rows
    val multi = Multimodal.parseMp4Frames(
      mp4Samples("jpeg", 32, 16, jf, Seq(2, 2, 1))).get
    assert(multi == viaAvi)
    // grids agree with the AVI grid path frame by frame
    val gAvi = Multimodal.aviFrameGrids(
      aviOf("MJPG".getBytes("US-ASCII"), 32, 16, jf.map(("00dc", _)))).get
    val gMp4 = Multimodal.mp4FrameGrids(
      mp4Samples("jpeg", 32, 16, jf, Seq(2, 2, 1))).get
    assert(gMp4.size == gAvi.size &&
      gMp4.zip(gAvi).forall { case ((i1, w1, h1, p1), (i2, w2, h2, p2)) =>
        i1 == i2 && w1 == w2 && h1 == h2 && p1.sameElements(p2) })
    // maxFrames fence
    assert(Multimodal.parseMp4Frames(
      mp4Samples("jpeg", 32, 16, jf, Seq(5)), maxFrames = 3).get.size == 3)
    // a corrupt middle sample is skipped, the rest decode
    val bad = jf.updated(2, jf(2).take(25))
    val skipped = Multimodal.parseMp4Frames(
      mp4Samples("jpeg", 32, 16, bad, Seq(5))).get
    assert(skipped.size == 4 && skipped.map(_.sumR) ==
      (viaAvi.take(2) ++ viaAvi.drop(3)).map(_.sumR))
    // refusals: inter-frame codec stays metadata-only; junk; null
    assert(Multimodal.parseMp4Frames(
      mp4Samples("avc1", 32, 16, jf, Seq(5))).isEmpty)
    assert(Multimodal.parseMp4Frames("no ftyp here!!!!".getBytes).isEmpty)
    assert(Multimodal.parseMp4Frames(null).isEmpty)
    // truncation sweep + corruption never throw
    val seed = mp4Samples("jpeg", 32, 16, jf.take(2), Seq(2))
    (1 until seed.length by 3).foreach(n => Multimodal.parseMp4Frames(seed.take(n)))
    val rnd = new scala.util.Random(59)
    (1 to 300).foreach { k =>
      val c = seed.clone()
      (0 to k % 4).foreach(_ => c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte)
      Multimodal.parseMp4Frames(c)
    }
  }

  test("describeVideo routes mp4's first vide track, avi, and junk rows") {
    val rows = Seq(
      (1L, mp4File(
        trak(9, v1 = false, "soun", "mp4a", 0, 0, 100, 48000, 480000),
        trak(3, v1 = false, "vide", "vp09", 320, 180, 50, 1000, 2000))),
      (2L, {
        val b = java.nio.ByteBuffer.allocate(88).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put("RIFF".getBytes).putInt(80).put("AVI ".getBytes)
          .put("LIST".getBytes).putInt(68).put("hdrl".getBytes)
          .put("avih".getBytes).putInt(56)
        b.putInt(40000).putInt(0).putInt(0).putInt(0)
          .putInt(25).putInt(0).putInt(1).putInt(0)
          .putInt(160).putInt(120).putInt(0).putInt(0).putInt(0).putInt(0)
        b.array()
      }),
      (3L, "not a video".getBytes("UTF-8")))
    val media = Multimodal.asMedia(rows.toDF("id", "bytes"), "id", "bytes", "video")
    val out = Multimodal.describeVideo(media).orderBy("media_id")
      .as[(Long, Option[String], Option[Int], Option[Int], Option[Long],
           Option[Long], Option[String], Option[Int])].collect().toSeq
    assert(out(0) == ((1L, Some("mp4"), Some(320), Some(180), Some(50L),
      Some(2000L), Some("vp09"), Some(2))))
    assert(out(1) == ((2L, Some("avi"), Some(160), Some(120), Some(25L),
      Some(1000L), None, Some(1))))
    assert(out(2) == ((3L, None, None, None, None, None, None, None)))
  }

  test("aviFrameGrids materializes exact pixels: DIB bottom-up, top-down, MJPEG parity") {
    // DIB bottom-up: stored row r is image row h-1-r
    val w = 10; val h = 9
    val rowBytes = ((w * 3 + 3) / 4) * 4
    def dibBody = {
      val b = new Array[Byte](rowBytes * h)
      (0 until h).foreach(r => (0 until w).foreach { x =>
        val o = r * rowBytes + x * 3
        b(o) = (x + r).toByte; b(o + 1) = (2 * x).toByte; b(o + 2) = (3 * r).toByte
      })
      b
    }
    val up = Multimodal.aviFrameGrids(
      aviOf(Array[Byte](0, 0, 0, 0), w, h, Seq(("00db", dibBody)))).get
    assert(up.size == 1)
    val (idx, gw, gh, grid) = up.head
    assert((idx, gw, gh) == ((0, w, h)))
    (0 until h).foreach { y => (0 until w).foreach { x =>
      val r = h - 1 - y // stored row for this image row
      val want = (((3 * r) & 0xff) << 16) | (((2 * x) & 0xff) << 8) | ((x + r) & 0xff)
      assert(grid(y * w + x) == want, s"($x,$y)")
    }}
    // top-down DIB (negative strf height) must NOT flip
    val down = Multimodal.aviFrameGrids(
      aviOf(Array[Byte](0, 0, 0, 0), w, -h, Seq(("00db", dibBody)))).get
    val gridD = down.head._4
    (0 until h).foreach { y => (0 until w).foreach { x =>
      val want = (((3 * y) & 0xff) << 16) | (((2 * x) & 0xff) << 8) | ((x + y) & 0xff)
      assert(gridD(y * w + x) == want, s"topdown ($x,$y)")
    }}
    // MJPEG frames: container grid == direct jpegRgbGrid on the bytes
    val jf = (0 until 2).map { f =>
      val img = new java.awt.image.BufferedImage(32, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 16).foreach(y => (0 until 32).foreach(x =>
        img.setRGB(x, y, ((x * 8 + f * 40 + y) % 256) * 0x010101)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpeg", bos)
      bos.toByteArray
    }
    val mj = Multimodal.aviFrameGrids(
      aviOf("MJPG".getBytes("US-ASCII"), 32, 16, jf.map(("00dc", _)))).get
    assert(mj.size == 2)
    mj.zipWithIndex.foreach { case ((fi, fw, fh, g), k) =>
      val (dw, dh, dg) = Multimodal.jpegRgbGrid(jf(k)).get
      assert((fi, fw, fh) == ((k, dw, dh)))
      assert(g.sameElements(dg))
    }
    // maxPixels fence skips frames, container still recognized
    assert(Multimodal.aviFrameGrids(
      aviOf("MJPG".getBytes("US-ASCII"), 32, 16, jf.map(("00dc", _))),
      maxPixels = 100).get.isEmpty)
  }

  test("describeVideoHashes matches imageDHash over independently decoded grids") {
    // same pixels through TWO paths: AVI/DIB → describeVideoHashes,
    // and BMP → decodeRgbGrid → imageDHash
    val w = 12; val h = 10
    def rgb(f: Int)(x: Int, y: Int): (Int, Int, Int) =
      ((x * 17 + y * 5 + f * 29) % 256, (x * 3 + y * 13 + f) % 256,
        (x * 7 + y + f * 11) % 256)
    val rowBytes = ((w * 3 + 3) / 4) * 4
    def dibBody(f: Int) = {
      val b = new Array[Byte](rowBytes * h)
      (0 until h).foreach { r =>
        val y = h - 1 - r
        (0 until w).foreach { x =>
          val (rr, gg, bb) = rgb(f)(x, y)
          val o = r * rowBytes + x * 3
          b(o) = bb.toByte; b(o + 1) = gg.toByte; b(o + 2) = rr.toByte
        }
      }
      b
    }
    def bmp(f: Int) = {
      val bb = java.nio.ByteBuffer.allocate(54 + rowBytes * h)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(54 + rowBytes * h)
        .putShort(0).putShort(0).putInt(54)
      bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(0).putInt(rowBytes * h).putInt(2835).putInt(2835)
        .putInt(0).putInt(0)
      bb.put(dibBody(f))
      bb.array()
    }
    val avi = aviOf(Array[Byte](0, 0, 0, 0), w, h,
      (0 until 3).map(f => ("00db", dibBody(f))))
    val media = Multimodal.asMedia(
      Seq((7L, avi), (8L, "junk".getBytes("UTF-8"))).toDF("id", "bytes"),
      "id", "bytes", "video")
    val got = Multimodal.describeVideoHashes(media)
      .orderBy("media_id", "frame_idx")
      .as[(Long, Int, Option[Long])].collect().toSeq
    val want = (0 until 3).map { f =>
      val Some((bw, bh, g)) = Multimodal.decodeRgbGrid(bmp(f))
      (7L, f, Multimodal.imageDHash(bw, bh, g))
    }
    assert(got == want)
    assert(got.forall(_._3.isDefined))
    // frames too small to hash keep their row with a null hash
    val tiny = aviOf(Array[Byte](0, 0, 0, 0), 4, 3,
      Seq(("00db", new Array[Byte](((4 * 3 + 3) / 4) * 4 * 3))))
    val tinyRows = Multimodal.describeVideoHashes(Multimodal.asMedia(
        Seq((9L, tiny)).toDF("id", "bytes"), "id", "bytes", "video"))
      .as[(Long, Int, Option[Long])].collect().toSeq
    assert(tinyRows == Seq((9L, 0, None)))
  }

  test("videoNearDupPairs: aligned-frame pigeonhole join and the half-frames gate") {
    // hashes chosen directly (the hash tier is pinned above): videos
    // 1/2 share all 4 aligned frames; 3 shares 2 of 4 with 1/2
    // (exactly half — passes) and 3 of 4 with 4; 4 shares only 1 of 4
    // with 1/2 (fails); 5 aligns nothing.
    def fr(id: Long, hs: Seq[Long]) = hs.zipWithIndex.map { case (v, i) => (id, i, v) }
    val far = 0xf0f0f0f0f0f0f0f0L // differs from 0 in 32 bits
    val rows = fr(1L, Seq(10L, 20L, 30L, 40L)) ++
      fr(2L, Seq(10L, 21L, 30L, 40L)) ++ // frame 1 hamming=1
      fr(3L, Seq(10L, 20L, far, far)) ++
      fr(4L, Seq(10L, far, far, far)) ++
      fr(5L, Seq(0x00ff00ff00ff00ffL, 0xff00ff00ff00ff00L,
        0x0f0f0f0f00000000L, 0x00000000f0f0f0f0L))
    val df = rows.toDF("media_id", "frame_idx", "dhash")
    val got = Multimodal.videoNearDupPairs(df, 3)
      .orderBy("id1", "id2")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 4L, 4L, 4L), (1L, 3L, 2L, 4L, 4L),
      (2L, 3L, 2L, 4L, 4L), (3L, 4L, 3L, 4L, 4L)))
    // null hashes drop from counts: a video of only null hashes pairs nothing
    val withNull = df.union(Seq((6L, 0, null.asInstanceOf[java.lang.Long]))
      .toDF("media_id", "frame_idx", "dhash"))
    assert(Multimodal.videoNearDupPairs(withNull, 3)
      .where(col("id1") === 6L || col("id2") === 6L).count() == 0)
  }

  test("hammingPairs64/videoNearDupPairs: hot-bucket fence bounds degenerate clusters") {
    // N all-black images (dHash 0 — the crawl boilerplate case): with
    // a bucket cap below N, all 4 chunk buckets go hot, the cluster is
    // fenced, and the join emits ZERO candidates instead of O(N²).
    val n = 12
    val blacks = (0 until n).map(i => (i.toLong, 0L))
    val live = Seq((100L, 0x1234567890abcdefL), (101L, 0x1234567890abcdecL)) // hamming 2
    val df = (blacks ++ live).toDF("media_id", "dhash")
    val fenced = Multimodal.hammingPairs64(df, "media_id", "dhash", 3, maxBucketSize = 4)
      .as[(Long, Long, Long)].collect().toSeq
    // the degenerate cluster contributes nothing; live pairs are untouched
    assert(fenced == Seq((100L, 101L, 2L)))
    val hot = Multimodal.hammingHotBuckets(df, "media_id", "dhash", 4)
      .as[(Int, Long, Long)].collect().toSeq.sorted
    assert(hot == (0 until 4).map(ci => (ci, 0L, n.toLong)))
    // default cap (100k) leaves small corpora unfenced: all-pairs among blacks
    assert(Multimodal.hammingPairs64(df, "media_id", "dhash", 3).count() ==
      n.toLong * (n - 1) / 2 + 1)

    // videos: a black lead-in frame shared by ALL videos is fenced per
    // (frame_idx, chunk); pairs still surface through real footage.
    def fr(id: Long, hs: Seq[Long]) = hs.zipWithIndex.map { case (v, i) => (id, i, v) }
    val vids = (0 until 8).flatMap(v =>
      fr(v.toLong, Seq(0L, 0x1111L * (v + 1), 0x20202L * (v + 1)))) ++
      fr(50L, Seq(0L, 0x9999888877776666L, 0x5555444433332222L)) ++
      fr(51L, Seq(0L, 0x9999888877776667L, 0x5555444433332222L))
    val vdf = vids.toDF("media_id", "frame_idx", "dhash")
    val vp = Multimodal.videoNearDupPairs(vdf, 3, maxBucketSize = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // only 50/51 share non-degenerate frames: 2 of 3 match (frame 0 fenced)
    assert(vp == Seq((50L, 51L, 2L, 3L, 3L)))
    val vhot = Multimodal.videoHotBuckets(vdf, 4).as[(Int, Int, Long, Long)].collect().toSeq
    // the black lead-in frame hits all 4 chunks with every video (10);
    // small hash values also share zero HIGH chunks in frames 1-2 (8)
    assert(vhot.filter(_._1 == 0).sorted == (0 until 4).map(ci => (0, ci, 0L, 10L)))
    assert(vhot.forall { case (_, _, cv, _) => cv == 0L })
  }

  test("sceneCuts: cut threshold boundary, null-hash continuation, scene rollup") {
    val A = 0L
    val B = (1L << 11) - 1        // 11 bits from A: > 10 → cut
    val C = B ^ (1L << 40)        // 12 bits from A, 1 bit from B: no cut vs B
    val atEdge = (1L << 10) - 1   // exactly 10 bits from A: NOT a cut
    val rows = Seq(
      // video 1: A A | B C | A'  → scenes (0: f0-f1), (1: f2-f3), (2: f4)
      (1L, 0, Some(A)), (1L, 1, Some(A)), (1L, 2, Some(B)),
      (1L, 3, Some(C)), (1L, 4, Some(B ^ (1L << 20) ^ (1L << 21) ^
        (1L << 22) ^ (1L << 23) ^ (1L << 24) ^ (1L << 25) ^ (1L << 26) ^
        (1L << 27) ^ (1L << 28) ^ (1L << 29) ^ (1L << 30))),
      // video 2: exactly-at-threshold stays one scene
      (2L, 0, Some(A)), (2L, 1, Some(atEdge)),
      // video 3: null hash mid-stream: no cut on it, and it shields
      // the next comparison (null XOR) — one scene of 3 frames
      (3L, 0, Some(A)), (3L, 1, None: Option[Long]), (3L, 2, Some(B)))
    val df = rows.toDF("media_id", "frame_idx", "dhash")
    val got = Multimodal.sceneCuts(df, 10)
      .orderBy("media_id", "scene_idx")
      .as[(Long, Long, Int, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 0, 2L), (1L, 1L, 2, 2L), (1L, 2L, 4, 1L),
      (2L, 0L, 0, 2L), (3L, 0L, 0, 3L)))
  }

  test("extractFeaturesBatched preserves order and batches payloads") {
    val rows = (0L until 10L).map(i => (i, s"payload-$i".getBytes("UTF-8")))
    val media = Multimodal.asMedia(rows.toDF("id", "bytes"), "id", "bytes", "image")
    val out = Multimodal.extractFeaturesBatched(media, batchSize = 3)()
      .orderBy("media_id").collect()
    assert(out.map(_.getLong(0)).toSeq == (0L until 10L))
    // features are the deterministic stub kernel's output, row-aligned
    val expect = Multimodal.stubBatchKernel(rows.map(_._2))
    out.zip(expect).foreach { case (r, e) =>
      assert(r.getSeq[Double](1) == e.toSeq)
    }
  }

  test("stripJpegMetadata: EXIF/COM drop, image segments byte-identical, " +
       "pass-through and fuzz") {
    // minimal TIFF: II, magic 42, IFD at 8 with one entry (tag 274
    // orientation = 6), next-IFD 0
    val tiff = {
      val b = java.nio.ByteBuffer.allocate(26)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
      b.putShort(1) // one IFD entry
      b.putShort(274).putShort(3).putInt(1).putShort(6).putShort(0)
      b.putInt(0)
      b.array()
    }
    def seg(marker: Int, body: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4 + body.length)
      b.putShort(marker.toShort).putShort((2 + body.length).toShort).put(body)
      b.array()
    }
    val app1 = seg(0xffe1, "Exif  ".getBytes("ISO-8859-1") ++ tiff)
    val com = seg(0xfffe, "gps secret".getBytes("US-ASCII"))
    val dqt = seg(0xffdb, Array.fill(65)(3.toByte)) // image segment: KEEP
    val sos = Array(0xff, 0xda, 0x00, 0x02).map(_.toByte) ++
      Array.fill(16)(0x55.toByte) ++ Array(0xff, 0xd9).map(_.toByte)
    val soi = Array(0xff, 0xd8).map(_.toByte)
    val before = soi ++ app1 ++ dqt ++ com ++ sos
    // before: EXIF readable; after: gone, image segments verbatim
    assert(Multimodal.parseExif(before).exists(_.orientation == 6))
    val after = Multimodal.stripJpegMetadata(before).get
    assert(Multimodal.parseExif(after).isEmpty)
    assert(java.util.Arrays.equals(after, soi ++ dqt ++ sos))
    assert(!new String(after, "ISO-8859-1").contains("gps secret"))
    // idempotent; non-JPEG passes None; fuzz never throws
    assert(java.util.Arrays.equals(
      Multimodal.stripJpegMetadata(after).get, after))
    assert(Multimodal.stripJpegMetadata("png bytes".getBytes).isEmpty)
    assert(Multimodal.stripJpegMetadata(null).isEmpty)
    val rnd = new scala.util.Random(93)
    (0 until 200).foreach { _ =>
      val mut = before.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      Multimodal.stripJpegMetadata(mut) // any outcome but a throw
    }
    // DataFrame form: scrubbed flag + removal accounting; non-JPEG
    // rows pass through untouched
    val media = Multimodal.asMedia(
      Seq((1L, before), (2L, "text".getBytes("UTF-8"))).toDF("id", "b"),
      "id", "b", "image")
    val rows = Multimodal.scrubJpegMetadata(media).orderBy("media_id").collect()
    assert(rows(0).getAs[Boolean]("scrubbed"))
    assert(rows(0).getAs[Long]("n_bytes_removed") ==
      (app1.length + com.length).toLong)
    assert(!rows(1).getAs[Boolean]("scrubbed"))
    assert(rows(1).isNullAt(rows(1).fieldIndex("n_bytes_removed")))
    assert(new String(rows(1).getAs[Array[Byte]]("payload"), "UTF-8") == "text")
  }
}
