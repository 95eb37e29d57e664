package graft.sources

import graft.SparkSpec

/** Pins [[Id3]]: all three v2 majors, the four text encodings, the
  * v1 trailer fallback, padding, syncsafe vs plain frame sizes, and
  * hostile bytes. */
class Id3Spec extends SparkSpec {

  test("v2.3 round-trips: latin1 + BOM'd UTF-16 frames, padding " +
       "stops the walk, frame count excludes padding") {
    val b = Id3.buildId3(3, "Café Title", "Ärtist — ünïcode",
      Some("The Album"), "1999", "Jazz")
    val t = Id3.parseId3(b).get
    assert(t.version == "2.3")
    assert(t.title.contains("Café Title"))
    assert(t.artist.contains("Ärtist — ünïcode"))
    assert(t.album.contains("The Album"))
    assert(t.year.contains("1999") && t.genre.contains("Jazz"))
    assert(t.nFrames == 5)
  }

  test("v2.4: syncsafe frame sizes past 127 bytes, UTF-8 and " +
       "UTF-16BE encodings, TDRC year truncates to 4 chars") {
    val long = "x" * 200 // frame payload > 127 forces syncsafe math
    val b = Id3.buildId3(4, long, "A", Some("Ω album"),
      "2024-06-01T12:00", "Метал")
    val t = Id3.parseId3(b).get
    assert(t.version == "2.4" && t.title.contains(long))
    assert(t.album.contains("Ω album"))
    assert(t.year.contains("2024"))
    assert(t.genre.contains("Метал"))
  }

  test("v2.2: 3-char ids and 3-byte sizes decode") {
    val t = Id3.parseId3(Id3.buildId3(2, "Old", "Tag", Some("Fmt"),
      "1996", "Pop")).get
    assert(t.version == "2.2" && t.title.contains("Old") &&
      t.artist.contains("Tag") && t.album.contains("Fmt") &&
      t.year.contains("1996") && t.genre.contains("Pop"))
  }

  test("ID3v1 trailer: standalone parse and v2-fallback for fields " +
       "the v2 tag lacks") {
    // v2 tag WITHOUT album + v1 trailer carrying it
    val b = Id3.buildId3(3, "T", "A", None, "2001", "G",
      v1Album = Some("V1 Album"))
    val t = Id3.parseId3(b).get
    assert(t.version == "2.3" && t.album.contains("V1 Album"))
    assert(t.genre.contains("G")) // v2 TCON wins over the v1 byte
    // bare v1 tag (no v2 header)
    val v1only = new Array[Byte](200)
    val tag = new Array[Byte](128)
    "TAG".getBytes.copyToArray(tag, 0)
    "My Song".getBytes.copyToArray(tag, 3)
    "Someone".getBytes.copyToArray(tag, 33)
    "1984".getBytes.copyToArray(tag, 93)
    tag(127) = 17
    System.arraycopy(tag, 0, v1only, 72, 128)
    val t1 = Id3.parseId3(v1only).get
    assert(t1.version == "1" && t1.title.contains("My Song") &&
      t1.artist.contains("Someone") && t1.year.contains("1984") &&
      t1.genre.contains("17"))
  }

  test("hostile bytes never throw; untagged payloads yield None") {
    assert(Id3.parseId3(null).isEmpty)
    assert(Id3.parseId3("no tag here".getBytes).isEmpty)
    assert(Id3.parseId3("ID3".getBytes).isEmpty)
    val good = Id3.buildId3(3, "T", "A", Some("B"), "2000", "G")
    val rnd = new scala.util.Random(5)
    (0 until 200).foreach { _ =>
      val bad = good.clone()
      bad(rnd.nextInt(bad.length)) =
        (bad(rnd.nextInt(bad.length)) ^ (1 << rnd.nextInt(8))).toByte
      Id3.parseId3(bad) // must not throw
    }
    (0 until 100).foreach { _ =>
      Id3.parseId3(good.take(rnd.nextInt(good.length)))
    }
    // declared size past EOF clamps
    val lying = good.clone()
    lying(9) = 0x7f
    Id3.parseId3(lying)
  }

  test("describeId3 over a mixed column") {
    import spark.implicits._
    val df = Seq(
      (1L, Id3.buildId3(4, "S", "P", Some("L"), "2020", "Electro")),
      (2L, "plain".getBytes)).toDF("media_id", "payload")
    val rows = Id3.describeId3(
        Multimodal.asMedia(df, "media_id", "payload", "audio"))
      .orderBy("media_id").collect()
    assert(rows(0).getAs[String]("version") == "2.4" &&
      rows(0).getAs[String]("genre") == "Electro")
    assert(rows(1).isNullAt(rows(1).fieldIndex("version")))
  }
}
