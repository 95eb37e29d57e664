package graft.sources

import graft.SparkSpec

/** Pins [[Ogg]] — the container walk: page CRCs, lacing/packet
  * accounting, codec ID headers, granule→duration, multiplexed
  * streams, hostile bytes. */
class OggSpec extends SparkSpec {

  test("the spec CRC-32 (direct form, 0x04C11DB7, init/xorout 0) " +
       "matches independently computed vectors") {
    assert(Ogg.crcOgg(Array(0x01.toByte), 0, 1) == 0x04c11db7L)
    assert(Ogg.crcOgg(Array(0x80.toByte, 0, 0, 0), 0, 4) == 0xa6e63d1dL)
    val s = "123456789".getBytes("US-ASCII")
    assert(Ogg.crcOgg(s, 0, s.length) == 0x89a1897fL)
  }

  test("vorbis stream round-trips: codec, channels, rate, pages, " +
       "packets, duration from the last granule") {
    val b = Ogg.buildOgg(serial = 77L, codec = "vorbis", channels = 2,
      rate = 44100, nDataPages = 3, packetsPerPage = 4,
      lastGranule = 44100L * 7)
    val ss = Ogg.parseOgg(b).get
    assert(ss.length == 1)
    val s = ss.head
    assert(s.serial == 77L && s.codec == "vorbis" && s.channels == 2 &&
      s.sampleRate == 44100)
    assert(s.nPages == 4) // BOS + 3 data
    assert(s.nPackets == 1 + 3 * 4)
    assert(s.lastGranule == 44100L * 7 && s.durationMs == 7000L)
  }

  test("opus duration subtracts pre-skip at 48 kHz; a 300-byte " +
       "packet spans lacing 255 and still counts once") {
    val b = Ogg.buildOgg(serial = 5L, codec = "opus", channels = 1,
      rate = 16000, nDataPages = 2, packetsPerPage = 2,
      lastGranule = 48000L * 3 + 312, spanPacket = true)
    val s = Ogg.parseOgg(b).get.head
    assert(s.codec == "opus" && s.channels == 1 && s.sampleRate == 16000)
    assert(s.durationMs == 3000L)
    assert(s.nPackets == 1 + 2 * 2 + 1) // id + 4 small + 1 spanned
  }

  test("two multiplexed logical streams demux by serial") {
    val a = Ogg.buildOgg(1L, "vorbis", 2, 48000, 1, 2, 48000L)
    val b = Ogg.buildOgg(2L, "opus", 1, 48000, 1, 3, 48312L)
    // interleave page-wise: concatenation is also a legal chained
    // stream; parse must keep them separate either way
    val ss = Ogg.parseOgg(a ++ b).get
    assert(ss.map(_.serial).toSet == Set(1L, 2L))
    assert(ss.find(_.serial == 1L).get.codec == "vorbis")
    assert(ss.find(_.serial == 2L).get.codec == "opus")
  }

  test("a flipped bit fails the page CRC and ends the walk at the " +
       "last good page; hostile bytes never throw") {
    val good = Ogg.buildOgg(9L, "vorbis", 2, 8000, 3, 2, 8000L * 5)
    // find the second page start to corrupt it (keep BOS intact)
    var p2 = 4
    var found = 0
    while (found < 1 && p2 < good.length - 4) {
      if (good(p2) == 'O' && good(p2 + 1) == 'g' && good(p2 + 2) == 'g' &&
          good(p2 + 3) == 'S') found += 1
      p2 += 1
    }
    val bad = good.clone()
    bad(p2 + 40) = (bad(p2 + 40) ^ 0x10).toByte
    val s = Ogg.parseOgg(bad).get.head
    assert(s.nPages == 1) // only the BOS page survived
    assert(Ogg.parseOgg(null).isEmpty)
    assert(Ogg.parseOgg("OggS but not really a page".getBytes).isEmpty)
    val rnd = new scala.util.Random(3)
    (0 until 200).foreach { _ =>
      val junk = new Array[Byte](80)
      rnd.nextBytes(junk)
      junk(0) = 'O'; junk(1) = 'g'; junk(2) = 'g'; junk(3) = 'S'
      Ogg.parseOgg(junk) // must not throw
    }
    (0 until 100).foreach { _ =>
      val cut = good.take(rnd.nextInt(good.length))
      Ogg.parseOgg(cut) // truncation never throws
    }
  }

  test("describeOgg: one row per stream; null row for non-ogg") {
    import spark.implicits._
    val df = Seq(
      (1L, Ogg.buildOgg(4L, "vorbis", 2, 44100, 2, 2, 88200L)),
      (2L, "nope".getBytes)).toDF("media_id", "payload")
    val rows = Ogg.describeOgg(
        Multimodal.asMedia(df, "media_id", "payload", "audio"))
      .orderBy("media_id", "stream_idx").collect()
    assert(rows(0).getAs[String]("codec") == "vorbis")
    assert(rows(0).getAs[Long]("duration_ms") == 2000L)
    assert(rows(1).isNullAt(rows(1).fieldIndex("codec")))
  }
}
