package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Subtitles]] — SRT/WebVTT cue extraction — on hand-built
  * payloads covering the format corners the q261 fixtures don't
  * (CRLF, BOM, dot-separator SRT, hour-less VTT, NOTE/STYLE blocks,
  * malformed-block skipping) plus the hostile-bytes posture. */
class SubtitlesSpec extends SparkSpec {
  import spark.implicits._
  import Subtitles._

  test("SRT: index lines, comma stamps, multi-line text, CRLF, tolerances") {
    val srt = "1\r\n00:00:01,500 --> 00:00:03,000\r\nhello\r\nworld\r\n\r\n" +
      "2\r\n00:01:00,000 --> 00:01:02,250\r\nsecond cue\r\n"
    val Some(("srt", cues)) = parseCues(srt.getBytes("UTF-8"))
    assert(cues == Seq(Cue(0, 1500L, 3000L, "hello\nworld"),
      Cue(1, 60000L, 62250L, "second cue")))
    // missing index line tolerated; dot separators tolerated
    val bare = "00:00:00.100 --> 00:00:00.900\nno index\n\n" +
      "01:02:03,004 --> 01:02:04,005\nwith hours\n"
    val Some(("srt", c2)) = parseCues(bare.getBytes("UTF-8"))
    assert(c2 == Seq(Cue(0, 100L, 900L, "no index"),
      Cue(1, 3723004L, 3724005L, "with hours")))
    // a malformed timing block is skipped, later cues still parse
    // (and keep DENSE ordinals)
    val mixed = "1\n00:00:99,000 --> 00:00:01,000\nbad seconds\n\n" +
      "2\nnot a timing\nline\n\n3\n00:00:05,000 --> 00:00:06,000\ngood\n"
    val Some(("srt", c3)) = parseCues(mixed.getBytes("UTF-8"))
    assert(c3 == Seq(Cue(0, 5000L, 6000L, "good")))
  }

  test("VTT: BOM+header, NOTE/STYLE skipped, cue ids, short stamps, settings") {
    val vtt = "﻿WEBVTT - test file\nKind: captions\nLanguage: en\n\n" +
      "NOTE\nthis comment spans\ntwo lines\n\n" +
      "STYLE\n::cue { color: red }\n\n" +
      "intro-cue\n00:05.000 --> 00:07.500 align:start position:10%\nshort stamps\n\n" +
      "01:00:00.000 --> 01:00:01.000\nno cue id, with hours\n"
    val Some(("vtt", cues)) = parseCues(vtt.getBytes("UTF-8"))
    assert(cues == Seq(Cue(0, 5000L, 7500L, "short stamps"),
      Cue(1, 3600000L, 3601000L, "no cue id, with hours")))
    // an empty-cue VTT is still a VTT (format recognized, zero cues)
    assert(parseCues("WEBVTT\n".getBytes("UTF-8")) == Some(("vtt", Seq())))
  }

  test("refusals, fences and hostile bytes") {
    assert(parseCues(null).isEmpty)
    assert(parseCues(Array.emptyByteArray).isEmpty)
    assert(parseCues("just some text\nwith lines\n".getBytes("UTF-8")).isEmpty)
    // an arrow without valid stamps is not a timing line
    assert(parseCues("a --> b\ntext\n".getBytes("UTF-8")).isEmpty)
    // maxCues fence
    val many = (1 to 10).map(k =>
      s"$k\n00:00:0${(k - 1) % 10},000 --> 00:00:0${k % 10},500\ncue $k")
      .mkString("\n\n")
    assert(parseCues(many.getBytes("UTF-8"), maxCues = 3).get._2.size == 3)
    // truncation sweep + byte corruption never throw
    val seed = ("WEBVTT\n\n1\n00:00:01.000 --> 00:00:02.000\nx\n\n" +
      "2\n00:00:03.000 --> 00:00:04.000\ny\n").getBytes("UTF-8")
    (1 until seed.length).foreach(n => parseCues(seed.take(n)))
    val rnd = new scala.util.Random(61)
    (1 to 200).foreach { k =>
      val c = seed.clone()
      (0 to k % 3).foreach(_ => c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte)
      parseCues(c)
    }
  }

  test("alignCuesToFrames: midpoint argmin, tie to lower frame, boundary and drop") {
    val cues = Seq(
      (1L, 0, 0L, 100L, "a"),    // frames at 0,40,80 in range; mid 50 → 40
      (1L, 1, 40L, 120L, "b"),   // 40,80 in range; mid 80 → 80
      (1L, 2, 30L, 90L, "c"),    // 40,80; |80-120|=40 vs |160-120|=40 tie → 40
      (1L, 3, 300L, 400L, "d"),  // no frame in range → dropped
      (2L, 0, 0L, 50L, "e"))     // other video: only ITS frames considered
      .toDF("media_id", "cue_idx", "start_ms", "end_ms", "text")
    val frames = (Seq((1L, 0), (1L, 1), (1L, 2)) ++ Seq((2L, 0)))
      .toDF("media_id", "frame_idx")
    val got = Subtitles.alignCuesToFrames(cues, frames, 40)
      .orderBy("media_id", "cue_idx")
      .as[(Long, Int, Long, Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0, 0L, 100L, "a", 1L, 40L),
      (1L, 1, 40L, 120L, "b", 2L, 80L),
      (1L, 2, 30L, 90L, "c", 1L, 40L),
      (2L, 0, 0L, 50L, "e", 0L, 0L)))
    // end is exclusive: a frame AT end_ms does not align
    val edge = Seq((3L, 0, 0L, 40L, "x"))
      .toDF("media_id", "cue_idx", "start_ms", "end_ms", "text")
    val ef = Seq((3L, 1)).toDF("media_id", "frame_idx") // t = 40 == end
    assert(Subtitles.alignCuesToFrames(edge, ef, 40).count() == 0)
  }

  test("stripCueMarkup: tags and timestamps drop, entities decode, hostile markup stays literal") {
    assert(stripCueMarkup("<v Alice>hi <i>there</i></v>") == "hi there")
    assert(stripCueMarkup("<c.yellow.bg_blue>styled</c>") == "styled")
    assert(stripCueMarkup("word<00:00:01.500>karaoke") == "wordkaraoke")
    assert(stripCueMarkup("a &amp; b &lt;tag&gt; c&nbsp;d") == "a & b <tag> c d")
    assert(stripCueMarkup("rtl&rlm; ltr&lrm;!") == "rtl ltr!")
    // unterminated '<' and unknown entities are literal text
    assert(stripCueMarkup("3 < 5 and stuff") == "3 < 5 and stuff")
    assert(stripCueMarkup("&unknown; &toolongentity;") == "&unknown; &toolongentity;")
    assert(stripCueMarkup("") == "")
    assert(stripCueMarkup(null) == null)
    // plain text fast path returns the same instance
    val plain = "no markup at all"
    assert(stripCueMarkup(plain) eq plain)
  }

  test("boilerplateCues: folded-text distinct-video counts and threshold") {
    val cues = Seq(
      (1L, 0, "Thanks For Watching"), (1L, 1, "unique a"),
      (2L, 0, "thanks for watching"), (2L, 1, "unique b"),
      (3L, 0, "  thanks for watching  "), // trim folds too
      (4L, 0, "thanks for watching"), (4L, 1, "thanks for watching"),
      (5L, 0, "THANKS FOR WATCHING"))
      .toDF("media_id", "cue_idx", "text")
    val got = Subtitles.boilerplateCues(cues, 5)
      .orderBy("media_id", "cue_idx")
      .as[(Long, Int, String, Long, Boolean)].collect().toSeq
    // 5 distinct videos carry the folded outro (video 4 twice counts once)
    assert(got.filter(_._3.toLowerCase.contains("thanks")).forall(r =>
      r._4 == 5L && r._5))
    assert(got.find(_._3 == "unique a").get == ((1L, 1, "unique a", 1L, false)))
    // below threshold: minVideos 6 flags nothing
    assert(Subtitles.boilerplateCues(cues, 6)
      .where(col("is_boilerplate")).count() == 0)
  }

  test("describeSubtitles: one row per cue, junk contributes nothing") {
    val srt = "1\n00:00:01,000 --> 00:00:02,000\na\n\n" +
      "2\n00:00:03,000 --> 00:00:04,000\nb\n"
    val vtt = "WEBVTT\n\n00:09.000 --> 00:10.000\nc\n"
    val media = Multimodal.asMedia(
      Seq((1L, srt.getBytes("UTF-8")), (2L, vtt.getBytes("UTF-8")),
        (3L, "junk".getBytes("UTF-8"))).toDF("id", "bytes"),
      "id", "bytes", "subtitle")
    val got = Subtitles.describeSubtitles(media)
      .orderBy("media_id", "cue_idx")
      .as[(Long, String, Int, Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, "srt", 0, 1000L, 2000L, "a"),
      (1L, "srt", 1, 3000L, 4000L, "b"),
      (2L, "vtt", 0, 9000L, 10000L, "c")))
  }
}
