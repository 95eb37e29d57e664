package graft.sources

import graft.SparkSpec

/** Pins [[Heif]]: the meta/iinf/iprp/ipco/ispe walk, largest-extent
  * selection, both iinf versions, the largesize box form, and
  * hostile bytes. */
class HeifSpec extends SparkSpec {

  test("avif round-trips: brand, largest ispe wins, item count, " +
       "ispe count; thumbnails never displace the primary") {
    val b = Heif.buildHeif("avif",
      Seq((160L, 120L), (1920L, 1080L), (32L, 32L)), nItems = 3)
    val h = Heif.parseHeif(b).get
    assert(h.brand == "avif" && h.width == 1920 && h.height == 1080)
    assert(h.nItems == 3 && h.nIspe == 3)
  }

  test("heic brand parses; the size==1 largesize meta box walks") {
    val h = Heif.parseHeif(Heif.buildHeif("heic", Seq((64L, 48L)),
      nItems = 1, largesize = true)).get
    assert(h.brand == "heic" && h.width == 64 && h.height == 48 &&
      h.nIspe == 1)
  }

  test("hand-built iinf version 1 uses the 32-bit item count") {
    // splice a v1 iinf: FullBox version 1, count as u32
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(t: String, p: Array[Byte]) =
      be32(8L + p.length) ++ t.getBytes("US-ASCII") ++ p
    val ftyp = box("ftyp", "avif".getBytes ++ be32(0) ++ "avif".getBytes)
    val iinf = box("iinf", Array[Byte](1, 0, 0, 0) ++ be32(70000L))
    val ispe = box("ispe", Array[Byte](0, 0, 0, 0) ++ be32(10) ++ be32(20))
    val meta = box("meta", Array[Byte](0, 0, 0, 0) ++ iinf ++
      box("iprp", box("ipco", ispe)))
    val h = Heif.parseHeif(ftyp ++ meta).get
    assert(h.nItems == 70000L && h.width == 10 && h.height == 20)
  }

  test("hostile bytes never throw: truncation, size lies, non-heif") {
    assert(Heif.parseHeif(null).isEmpty)
    assert(Heif.parseHeif("not a heif".getBytes).isEmpty)
    // mp4 brand is NOT heif
    val mp4ish = Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes ++
      Array.fill[Byte](8)(0)
    assert(Heif.parseHeif(mp4ish).isEmpty)
    val good = Heif.buildHeif("avif", Seq((100L, 50L)), 1)
    val rnd = new scala.util.Random(9)
    (0 until 200).foreach { _ =>
      val bad = good.clone()
      bad(rnd.nextInt(bad.length)) =
        (bad(rnd.nextInt(bad.length)) ^ (1 << rnd.nextInt(8))).toByte
      Heif.parseHeif(bad) // must not throw
    }
    (0 until 60).foreach(k => Heif.parseHeif(good.take(k * 3)))
  }

  test("inspectMedia names avif/heic payloads with their dimensions") {
    import spark.implicits._
    val df = Seq(
      (1L, Heif.buildHeif("avif", Seq((640L, 480L)), 1)),
      (2L, "x".getBytes)).toDF("media_id", "payload")
    val rows = Multimodal.inspectMedia(
        Multimodal.asMedia(df, "media_id", "payload", "image"))
      .orderBy("media_id").collect()
    assert(rows(0).getAs[String]("format") == "avif")
    assert(rows(0).getAs[Int]("width") == 640 &&
      rows(0).getAs[Int]("height") == 480)
    assert(rows(1).isNullAt(rows(1).fieldIndex("format")))
  }
}
