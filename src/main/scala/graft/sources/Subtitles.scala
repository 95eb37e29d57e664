package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Subtitle/caption extraction for video-text corpora — SubRip (SRT)
  * and WebVTT, the two formats a crawled video corpus actually
  * carries. Captions are the text half of video-text training pairs,
  * so this is the multimodal tier's text bridge: one row per cue with
  * integer millisecond timings, ready to align against
  * [[Multimodal.describeVideoFrames]] output by timestamp.
  *
  * Format scope (from the SubRip de-facto spec and W3C WebVTT):
  * - SRT: blank-line-separated blocks of [numeric index line],
  *   `HH:MM:SS,mmm --> HH:MM:SS,mmm` timing line, text lines. The
  *   index line is tolerated missing (common in the wild); dot
  *   separators are tolerated (SRT emitted by VTT converters).
  * - WebVTT: `WEBVTT` magic (optional BOM), header metadata to the
  *   first blank line; cue blocks with an optional id line, a timing
  *   line `[HH:]MM:SS.mmm --> [HH:]MM:SS.mmm [settings…]` (hours
  *   optional per spec, settings after the end stamp ignored), and
  *   NOTE / STYLE / REGION blocks skipped.
  *
  * Hostile posture matches the media kernels: undecodable payloads
  * return None, malformed blocks are skipped (cursor still advances),
  * cue count fenced by `maxCues`, never a throw.
  *
  * Reference anchor: the reference ships no subtitle parsers; this
  * extends SURVEY §2's multimodal tier (formats from the SubRip
  * convention and the W3C WebVTT recommendation). */
object Subtitles {

  final case class Cue(cueIdx: Int, startMs: Long, endMs: Long, text: String)

  /** `[HH:]MM:SS[.,]mmm` → milliseconds, or -1 if not a timestamp. */
  private def parseStamp(s: String): Long = {
    val t = s.trim
    val parts = t.split(":", -1)
    if (parts.length < 2 || parts.length > 3) return -1L
    val secMs = parts.last.split("[.,]", -1)
    if (secMs.length != 2 || secMs(1).length != 3) return -1L
    val nums = parts.dropRight(1) :+ secMs(0) :+ secMs(1)
    if (nums.exists(p => p.isEmpty || p.length > 9 || !p.forall(_.isDigit)))
      return -1L
    val vals = nums.map(_.toLong)
    val (hh, mm, ss, ms) =
      if (parts.length == 3) (vals(0), vals(1), vals(2), vals(3))
      else (0L, vals(0), vals(1), vals(2))
    if (mm > 59 || ss > 59) return -1L
    ((hh * 60 + mm) * 60 + ss) * 1000 + ms
  }

  /** A timing line's (startMs, endMs), or None. VTT cue settings
    * after the end stamp are ignored per spec. */
  private def parseTiming(line: String): Option[(Long, Long)] = {
    val arrow = line.indexOf("-->")
    if (arrow < 0) return None
    val start = parseStamp(line.substring(0, arrow))
    val tail = line.substring(arrow + 3).trim
    val endTok = tail.takeWhile(c => !c.isWhitespace)
    val end = parseStamp(endTok)
    if (start < 0 || end < 0) None else Some((start, end))
  }

  /** Parse an SRT or WebVTT payload into (format, cues). Cue index is
    * the 0-based ordinal in file order — NOT the SRT index label,
    * which is advisory and often wrong in crawled files. */
  def parseCues(bytes: Array[Byte],
                maxCues: Int = 1 << 16): Option[(String, Seq[Cue])] = {
    if (bytes == null || bytes.length == 0 || bytes.length > (1 << 26)) return None
    val raw = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    val text = if (raw.nonEmpty && raw.charAt(0) == '\uFEFF') raw.substring(1) else raw
    val lines = text.split("\r\n|\n|\r", -1)
    val isVtt = lines.nonEmpty && lines(0).startsWith("WEBVTT")
    val out = Seq.newBuilder[Cue]
    var idx = 0
    var i = 0
    if (isVtt) {
      // skip the header block (magic line + metadata to first blank)
      i = 1
      while (i < lines.length && lines(i).trim.nonEmpty) i += 1
    }
    var sawTiming = false
    while (i < lines.length && idx < maxCues) {
      // skip blank separators
      while (i < lines.length && lines(i).trim.isEmpty) i += 1
      if (i < lines.length) {
        val blockStart = i
        var end = i
        while (end < lines.length && lines(end).trim.nonEmpty) end += 1
        val block = lines.slice(blockStart, end)
        val head = block(0).trim
        def isKeyword(k: String): Boolean = // per spec: the word alone
          head == k || head.startsWith(k + " ") || head.startsWith(k + "\t")
        if (isVtt && (isKeyword("NOTE") || head == "STYLE" ||
            isKeyword("REGION"))) {
          // comment/style block: skipped entirely ("NOTEBOOK cue-id"
          // is NOT a comment — the keyword must end at a word break)
        } else {
          // timing line is the first line containing "-->"; anything
          // before it is the SRT index / VTT cue id
          val tIdx = block.indexWhere(_.contains("-->"))
          if (tIdx >= 0 && tIdx <= 1) parseTiming(block(tIdx)) match {
            case Some((s, e)) =>
              sawTiming = true
              out += Cue(idx, s, e, block.drop(tIdx + 1).mkString("\n"))
              idx += 1
            case None => () // malformed timing: skip block
          }
        }
        i = end
      }
    }
    if (isVtt) Some(("vtt", out.result()))
    else if (sawTiming) Some(("srt", out.result()))
    else None
  }

  /** Strip WebVTT cue-text markup for training text: tag spans
    * (`<i>`, `<b>`, `<u>`, `<c.class>`, `<v Speaker>`, `<lang en>`,
    * `<ruby>`, `<rt>`, their closers) and inline karaoke timestamps
    * (`<00:01.000>`) drop; the VTT character entities `&amp;` `&lt;`
    * `&gt;` `&nbsp;` `&lrm;` `&rlm;` decode (`&nbsp;` normalizes to a
    * PLAIN space and directional marks to nothing — training text
    * wants content, not layout). A `<` with no closing `>`
    * is literal text — hostile markup never eats content. Linear
    * single pass, no regex backtracking. */
  def stripCueMarkup(s: String): String = {
    if (s == null || (s.indexOf('<') < 0 && s.indexOf('&') < 0)) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        val close = s.indexOf('>', i + 1)
        val body = if (close < 0) null else s.substring(i + 1, close)
        val isTag = body != null && body.nonEmpty && {
          val h = body.charAt(0)
          // VTT tags open with a letter or '/'; timestamps are digits
          // and ':' '.' only — "score <3 but > avg" keeps its text
          h.isLetter || h == '/' || body.forall(t => t.isDigit || t == ':' || t == '.')
        }
        if (isTag) i = close + 1                // tag/timestamp: dropped
        else { sb.append(c); i += 1 }           // literal '<'
      } else if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val ent = if (semi > i && semi - i <= 6) s.substring(i + 1, semi) else null
        ent match {
          case "amp" => sb.append('&'); i = semi + 1
          case "lt" => sb.append('<'); i = semi + 1
          case "gt" => sb.append('>'); i = semi + 1
          case "nbsp" => sb.append(' '); i = semi + 1
          case "lrm" | "rlm" => i = semi + 1
          case _ => sb.append(c); i += 1 // unknown entity: literal
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** One row per cue of each subtitle payload — media frame in, cue
    * frame out; payloads that parse as neither format contribute no
    * rows. `stripMarkup` runs [[stripCueMarkup]] on each cue's text
    * (the training-text form). flatMap kernel: payload bytes never
    * cross a shuffle. */
  def describeSubtitles(media: DataFrame, maxCues: Int = 1 << 16,
                        stripMarkup: Boolean = false): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        parseCues(p, maxCues).toSeq.flatMap { case (fmt, cues) =>
          cues.map { c =>
            val t = if (stripMarkup) stripCueMarkup(c.text) else c.text
            (id, fmt, c.cueIdx, c.startMs, c.endMs, t)
          }
        }
      }
      .toDF("media_id", "format", "cue_idx", "start_ms", "end_ms", "text")
  }

  /** Cross-video boilerplate cue detection — the subtitle analog of
    * cross-document line dedup (intros, "subscribe" outros, encoder
    * credits repeat across a corpus): a cue is boilerplate when its
    * case-folded trimmed text appears in at least `minVideos`
    * DISTINCT videos. Output is every cue row with its corpus video
    * count and flag, ready for a boilerplate-stripping filter.
    * Scale: one text-keyed partial-agg shuffle (distinct video count
    * per text), then a text-keyed join back — both bounded by
    * distinct cue texts, never cue pairs. */
  def boilerplateCues(cues: DataFrame, minVideos: Int = 5): DataFrame = {
    val keyed = cues.withColumn("bp_key", lower(trim(col("text"))))
    val counts = keyed.groupBy(col("bp_key"))
      .agg(countDistinct(col("media_id")).as("n_videos"))
    keyed.join(counts, "bp_key")
      .select(col("media_id"), col("cue_idx"), col("text"),
        col("n_videos"),
        (col("n_videos") >= minVideos).as("is_boilerplate"))
  }

  /** The video-text PAIR builder: align each cue to its single best
    * frame — the frame whose timestamp (frame_idx · msPerFrame) falls
    * inside [start_ms, end_ms) and sits closest to the cue midpoint
    * (ties → lower frame index; distance kept integer as
    * |2·t − (start+end)|). One row per aligned cue; cues no frame
    * covers are dropped (an out-of-range caption has no image half).
    * Plan: a media-id-keyed equi-join carrying the range predicate as
    * its residual — NEVER a cross product — then one window rank per
    * (video, cue). Both sides arrive as bounded per-video sequences,
    * so at 100 TB the join and window shuffle on video id like every
    * per-video op here. */
  def alignCuesToFrames(cues: DataFrame, frames: DataFrame,
                        msPerFrame: Int = 40): DataFrame = {
    val f = frames.select(col("media_id").as("f_vid"),
      col("frame_idx").cast("long").as("key_frame"),
      (col("frame_idx").cast("long") * msPerFrame).as("frame_ms"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id"), col("cue_idx"))
      .orderBy(abs(col("frame_ms") * 2 - (col("start_ms") + col("end_ms"))),
        col("key_frame"))
    cues.join(f, col("media_id") === col("f_vid") &&
        col("frame_ms") >= col("start_ms") && col("frame_ms") < col("end_ms"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("media_id"), col("cue_idx"), col("start_ms"),
        col("end_ms"), col("text"), col("key_frame"), col("frame_ms"))
  }
}
