package graft.cli

import graft.SparkSpec

/** CLI verb dispatch, driven through the same run path `main` uses
  * (session reuse instead of a fresh JVM per verb). */
class CliSpec extends SparkSpec {

  private def runVerb(args: String*): Unit = {
    val m = Main.getClass.getDeclaredMethod("run",
      classOf[org.apache.spark.sql.SparkSession], classOf[List[String]])
    m.setAccessible(true)
    m.invoke(Main, spark, args.toList)
  }

  test("wordcount verb writes parquet output") {
    val tmp = java.nio.file.Files.createTempDirectory("cli").toString
    runVerb("wordcount", s"$sf/documents.parquet", "text", s"$tmp/wc")
    val out = spark.read.parquet(s"$tmp/wc")
    assert(out.columns.toSeq == Seq("w", "c") && out.count() > 0)
  }

  test("grep verb writes match counts") {
    val tmp = java.nio.file.Files.createTempDirectory("cli").toString
    runVerb("grep", s"$sf/documents.parquet", "text", "spark", s"$tmp/g")
    assert(spark.read.parquet(s"$tmp/g").count() == 1)
  }

  test("kmeans-step and cmsketch verbs run the new ops end to end") {
    val tmp = java.nio.file.Files.createTempDirectory("cli").toString
    runVerb("kmeans-step", s"$sf/embeddings.parquet",
      "vec_id", "embedding", "label", "64", s"$tmp/km")
    val km = spark.read.parquet(s"$tmp/km")
    assert(km.columns.toSeq == Seq("vec_id", "label", "assigned"))
    assert(km.count() ==
      spark.read.parquet(s"$sf/embeddings.parquet").count())
    runVerb("cmsketch", s"$sf/events.parquet", "user_id", "4", "64", s"$tmp/cm")
    val cm = spark.read.parquet(s"$tmp/cm")
    assert(cm.columns.toSeq == Seq("row_i", "col_i", "cnt"))
    assert(cm.count() <= 4 * 64)
  }

  test("quality and quantiles verbs run the round-9 ops end to end") {
    val tmp = java.nio.file.Files.createTempDirectory("cli").toString
    runVerb("quality", s"$sf/documents.parquet", "doc_id", "text", s"$tmp/q")
    val q = spark.read.parquet(s"$tmp/q")
    assert(q.columns.toSeq == Seq("doc_id", "n_feat", "quality"))
    assert(q.where("quality < 0 OR quality > 1").count() == 0)
    runVerb("quantiles", s"$sf/events.parquet", "event_type",
      "GREATEST(CAST(ROUND(value * 100) AS BIGINT), 1)", "50,99", s"$tmp/p")
    val p = spark.read.parquet(s"$tmp/p")
    assert(p.columns.toSeq == Seq("event_type", "n", "p50_lb", "p99_lb"))
    // lower bounds are powers of two and monotone across percentiles
    import org.apache.spark.sql.functions._
    assert(p.where(col("p99_lb") < col("p50_lb")).count() == 0)
    assert(p.where(expr("bit_count(p50_lb) != 1 OR bit_count(p99_lb) != 1")).count() == 0)
  }

  test("scrub, sketchindex and dedup-inc verbs run the curation ops end to end") {
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("cli").toString
    runVerb("scrub", s"$sf/documents.parquet", "doc_id", "text", "250", s"$tmp/scrubbed")
    val scrubbed = spark.read.parquet(s"$tmp/scrubbed")
    assert(scrubbed.count() ==
      spark.read.parquet(s"$sf/documents.parquet").count()) // every doc keeps a row
    assert(scrubbed.columns.toSet == Set("doc_id", "text", "n_lines"))

    runVerb("sketchindex", s"$sf/documents.parquet", "doc_id", "text", "3", s"$tmp/idx")
    runVerb("dedup-inc", s"$sf/documents.parquet", s"$tmp/idx",
      "doc_id", "text", "3", "0.5", s"$tmp/incdups")
    // deduping the corpus against its own index finds the planted
    // near-dup pairs (both orientations, self-pairs excluded)
    val pairs = spark.read.parquet(s"$tmp/incdups")
    assert(pairs.count() > 0)
    assert(pairs.where(col("new_id") === col("hist_id")).count() == 0)
  }

  test("archive verb accepts -distributed and rejects unknown flags") {
    val src = java.nio.file.Files.createTempDirectory("cli-har")
    java.nio.file.Files.writeString(src.resolve("a.txt"), "one\n")
    java.nio.file.Files.writeString(src.resolve("b.txt"), "two\n")
    val out = java.nio.file.Files.createTempDirectory("cli-har-out").toString
    runVerb("archive", "-distributed", src.toString, s"$out/t.har")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(s"har://$out/t.har"), spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(s"har://$out/t.har"))
      .map(_.getPath.getName).sorted
    assert(names.toSeq == Seq("a.txt", "b.txt"), names.toSeq)
    val e = intercept[java.lang.reflect.InvocationTargetException] {
      runVerb("archive", "-distribtued", src.toString, s"$out/typo.har")
    }
    assert(e.getCause.getMessage.contains("unknown flag"), e.getCause.getMessage)
  }

  test("dedup verb finds the planted near-duplicates") {
    val tmp = java.nio.file.Files.createTempDirectory("cli").toString
    runVerb("dedup", s"$sf/documents.parquet", "text", "doc_id", "0.5", s"$tmp/dd")
    assert(spark.read.parquet(s"$tmp/dd").count() > 0)
  }

  test("resolve verb turns a pair list into duplicate groups") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("cli").toString
    Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id1", "id2")
      .write.parquet(s"$tmp/pairs")
    runVerb("resolve", s"$tmp/pairs", s"$tmp/groups")
    val got = spark.read.parquet(s"$tmp/groups")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L), got)
  }

  test("signals, chunk and pack verbs compose into the curation walk") {
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("cli").toString
    runVerb("signals", s"$sf/documents.parquet", "doc_id", "text", s"$tmp/sig")
    val sig = spark.read.parquet(s"$tmp/sig")
    assert(sig.columns.contains("dup_ngram_char_frac") && sig.count() > 0)
    runVerb("chunk", s"$sf/documents.parquet", "doc_id", "text", "32+8", s"$tmp/chunks")
    val chunks = spark.read.parquet(s"$tmp/chunks")
    assert(chunks.count() > sig.count(), "expected multiple chunks per doc")
    assert(chunks.agg(org.apache.spark.sql.functions.max(col("n_tok"))).head.getLong(0) <= 32)
    // pack a token table on its unique key (packSequences' contract)
    spark.range(100).select(col("id"), (col("id") % 17 + 1).as("n_tok"))
      .write.parquet(s"$tmp/toks")
    runVerb("pack", s"$tmp/toks", "id", "n_tok", "64", s"$tmp/packed")
    val packed = spark.read.parquet(s"$tmp/packed")
    assert(packed.count() == 100)
    assert(packed.agg(org.apache.spark.sql.functions.max(col("pack_id"))).head.getLong(0) > 0)
    // decon: the corpus checked against itself is fully contaminated
    runVerb("decon", s"$sf/documents.parquet", s"$sf/documents.parquet",
      "doc_id", "text", "3", s"$tmp/decon")
    val dec = spark.read.parquet(s"$tmp/decon")
    assert(dec.where(col("contaminated")).count() == dec.count())
  }

  test("stream-window verb runs the streaming pipeline to completion") {
    val tmp = java.nio.file.Files.createTempDirectory("cli").toString
    graft.core.Tables.events(spark, sf).write.parquet(s"$tmp/in")
    runVerb("stream-window", s"$tmp/in", "user_id", "1 hour", s"$tmp/out")
    val out = spark.read.parquet(s"$tmp/out")
    assert(out.count() > 0)
    assert(out.columns.toSet == Set("user_id", "window_start", "n", "sv"))
  }

  test("stream-window continues incrementally over its checkpoint") {
    import spark.implicits._
    import java.sql.Timestamp
    val tmp = java.nio.file.Files.createTempDirectory("cli").toString
    def ev(minute: Int, id: Long) = (id,
      Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00"), 7L, 1.0)
    def write(rows: Seq[(Long, Timestamp, Long, Double)]) =
      rows.toDF("event_id", "ts", "user_id", "value")
        .write.mode("append").parquet(s"$tmp/in")
    // run 1: events in hour 0 plus one in hour 2 (advances watermark
    // past hour 0, which emits; hour 2 stays open)
    write(Seq(ev(5, 1), ev(10, 2), ev(125, 3)))
    runVerb("stream-window", s"$tmp/in", "user_id", "1 hour", s"$tmp/out")
    val after1 = spark.read.parquet(s"$tmp/out")
    assert(after1.where($"n" === 2).count() == 1, after1.collect().toSeq)
    // run 2: later data arrives; the checkpoint resumes, the open
    // hour-2 window closes and emits exactly once
    write(Seq(ev(300, 4)))
    runVerb("stream-window", s"$tmp/in", "user_id", "1 hour", s"$tmp/out")
    val after2 = spark.read.parquet(s"$tmp/out")
    assert(after2.count() == after1.count() + 1, after2.collect().toSeq)
  }

  test("split verb writes one partition directory per split label") {
    val tmp = java.nio.file.Files.createTempDirectory("cli").toString
    runVerb("split", s"$sf/documents.parquet", "doc_id",
      "train=0.8,val=0.1,test=0.1", s"$tmp/sp")
    val dirs = new java.io.File(s"$tmp/sp").listFiles()
      .filter(_.getName.startsWith("split=")).map(_.getName).sorted
    assert(dirs.toSeq == Seq("split=test", "split=train", "split=val"), dirs.toSeq)
    val back = spark.read.parquet(s"$tmp/sp")
    assert(back.count() == spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("pipe -reduce runs 'sort | uniq -c' as a contiguous-key reducer") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("cli").toString
    graft.core.Tables.documents(spark, sf).select($"lang")
      .write.parquet(s"$tmp/in")
    runVerb("pipe", "-reduce", "lang", s"$tmp/in",
      "bash", "-c", "sort | uniq -c", "--", s"$tmp/out")
    // every "count lang" line the child emitted, summed per lang, must
    // reproduce the groupBy counts (keys arrive contiguous per
    // partition, so uniq -c yields at most one line per lang per task)
    val got = spark.read.text(s"$tmp/out").as[String].collect()
      .map(_.trim.split("\\s+", 2)).map { case Array(n, l) => l -> n.toLong }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val want = graft.core.Tables.documents(spark, sf)
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(got == want, s"got=$got want=$want")
  }

  test("pipe -io typedbytes round-trips a typed table through cat") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("cli").toString
    graft.core.Tables.documents(spark, sf).select($"doc_id", $"lang")
      .write.parquet(s"$tmp/in")
    runVerb("pipe", "-io", "typedbytes", s"$tmp/in", "cat", "--", s"$tmp/out")
    val in = spark.read.parquet(s"$tmp/in").as[(Long, String)].collect().toSet
    val out = spark.read.parquet(s"$tmp/out").as[(Long, String)].collect().toSet
    assert(out == in, s"typed-bytes cat round-trip diverged: ${out.diff(in)}")
  }

  test("copy -diff verb syncs deletions") {
    val src = java.nio.file.Files.createTempDirectory("cli-sync").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$src/a.txt"), "a")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$src/b.txt"), "b")
    val dst = java.nio.file.Files.createTempDirectory("cli-sync").toString + "/out"
    runVerb("copy", s"$src", dst)
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$src/b.txt"))
    runVerb("copy", "-diff", s"$src", dst)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dst/b.txt")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dst/a.txt")))
  }

  test("copy verb round-trips a table") {
    val tmp = java.nio.file.Files.createTempDirectory("cli").toString
    runVerb("copy", s"$sf/nation.parquet", s"$tmp/nation")
    assert(spark.read.parquet(s"$tmp/nation").count() ==
      graft.core.Tables.nation(spark, sf).count())
  }

  test("setsim, bfs and dedup-keep verbs run end to end") {
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("cli").toString
    runVerb("setsim", s"$sf/documents.parquet", "doc_id", "text", "4", "5",
      s"$tmp/ss")
    val ss = spark.read.parquet(s"$tmp/ss")
    assert(ss.columns.toSet == Set("id1", "id2", "inter", "n1", "n2"))
    assert(ss.where(col("id1") >= col("id2")).count() == 0)

    import spark.implicits._
    Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("s", "t")
      .write.mode("overwrite").parquet(s"$tmp/edges")
    runVerb("bfs", s"$tmp/edges", "s", "t", "0", "2", s"$tmp/bfs")
    val bfs = spark.read.parquet(s"$tmp/bfs")
      .as[(Long, Int)].collect().toMap
    assert(bfs == Map(0L -> 0, 1L -> 1, 2L -> 2))

    runVerb("dedup-keep", s"$sf/documents.parquet", "doc_id", "text", "3",
      "0.5", s"$tmp/keep")
    val keep = spark.read.parquet(s"$tmp/keep")
    assert(keep.count() ==
      spark.read.parquet(s"$sf/documents.parquet").count())
    assert(keep.where(col("rep_id") > col("doc_id")).count() == 0) // rep is min
  }

  test("bpe-train then bpe-tokenize compose into the tokenizer walk") {
    val tmp = java.nio.file.Files.createTempDirectory("cli").toString
    runVerb("bpe-train", s"$sf/documents.parquet", "text", "5", s"$tmp/merges")
    val merges = spark.read.parquet(s"$tmp/merges")
    assert(merges.columns.toSeq == Seq("rank", "a", "b", "freq"))
    assert(merges.count() == 5)
    runVerb("bpe-tokenize", s"$sf/documents.parquet", "doc_id", "text",
      s"$tmp/merges", s"$tmp/toks")
    val toks = spark.read.parquet(s"$tmp/toks")
    assert(toks.columns.toSeq == Seq("doc_id", "w", "tokens"))
    import org.apache.spark.sql.functions.{col, concat_ws, size, length}
    // lossless: token concatenation reproduces every word
    assert(toks.where(concat_ws("", col("tokens")) =!= col("w")).count() == 0)
    // the learned merges actually fused something somewhere
    assert(toks.where(size(col("tokens")) < length(col("w"))).count() > 0)
  }

  test("substring-dups/scrub and curate-v5 verbs run the Lee-et-al pipeline end to end") {
    val tmp = java.nio.file.Files.createTempDirectory("cli").toString
    runVerb("substring-dups", s"$sf/documents.parquet", "doc_id", "text",
      "8", s"$tmp/dups")
    val dups = spark.read.parquet(s"$tmp/dups")
    assert(dups.columns.toSeq ==
      Seq("doc_id", "start_idx", "end_idx", "n_words"))
    runVerb("substring-scrub", s"$sf/documents.parquet", "doc_id", "text",
      "8", s"$tmp/scrubbed")
    val sc = spark.read.parquet(s"$tmp/scrubbed")
    assert(sc.columns.toSeq == Seq("doc_id", "text", "n_kept", "n_removed"))
    runVerb("curate-v5", s"$sf/documents.parquet", "doc_id", "text",
      "8", "32+8", "256", s"$tmp/v5")
    assert(spark.read.parquet(s"$tmp/v5/chunks").count() > 0)
    val packs = spark.read.parquet(s"$tmp/v5/packs")
    assert(packs.columns.contains("pack_id") && packs.count() > 0)
  }

  test("pcm-stats and bmp-stats verbs decode binary payload tables") {
    val tmp = java.nio.file.Files.createTempDirectory("cli").toString
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // one valid WAV (half-scale square), one valid 1x1 BMP, one junk
    val wav = {
      val b = java.nio.ByteBuffer.allocate(44 + 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(44).put("WAVE".getBytes)
        .put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
        .putInt(8000).putInt(16000).putShort(2).putShort(16)
        .put("data".getBytes).putInt(8)
      Seq(16384, -16384, 16384, -16384).foreach(s => b.putShort(s.toShort))
      b.array()
    }
    val bmp1 = {
      val b = java.nio.ByteBuffer.allocate(54 + 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(58).putShort(0).putShort(0).putInt(54)
      b.putInt(40).putInt(1).putInt(1).putShort(1).putShort(24)
        .putInt(0).putInt(4).putInt(0).putInt(0).putInt(0).putInt(0)
      b.put(10.toByte).put(20.toByte).put(30.toByte).put(0.toByte)
      b.array()
    }
    Seq((1L, wav), (2L, bmp1), (3L, "junk".getBytes("UTF-8")))
      .toDF("id", "payload").write.mode("overwrite").parquet(s"$tmp/media")
    runVerb("pcm-stats", s"$tmp/media", "id", "payload", s"$tmp/pcm")
    val pcm = spark.read.parquet(s"$tmp/pcm")
      .where(col("media_id") === 1L).head()
    assert(pcm.getAs[Double]("peak") == 0.5 && pcm.getAs[Long]("n_frames") == 4L)
    runVerb("bmp-stats", s"$tmp/media", "id", "payload", s"$tmp/bmp")
    val bm = spark.read.parquet(s"$tmp/bmp")
      .where(col("media_id") === 2L).head()
    assert(bm.getAs[Long]("sum_r") == 30L && bm.getAs[Long]("sum_b") == 10L)
    // junk payloads surface as nulls through both verbs
    assert(spark.read.parquet(s"$tmp/pcm")
      .where(col("media_id") === 3L).head().isNullAt(1))
    assert(spark.read.parquet(s"$tmp/bmp")
      .where(col("media_id") === 3L).head().isNullAt(1))
  }

  test("video-inspect verb reports AVI metadata and nulls for junk") {
    val tmp = java.nio.file.Files.createTempDirectory("cli").toString
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val avi = {
      val b = java.nio.ByteBuffer.allocate(88)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(80).put("AVI ".getBytes)
        .put("LIST".getBytes).putInt(68).put("hdrl".getBytes)
        .put("avih".getBytes).putInt(56)
      b.putInt(40000).putInt(0).putInt(0).putInt(0)
        .putInt(25).putInt(0).putInt(1).putInt(0)
        .putInt(160).putInt(120).putInt(0).putInt(0).putInt(0).putInt(0)
      b.array()
    }
    Seq((1L, avi), (2L, "junk".getBytes("UTF-8")))
      .toDF("id", "payload").write.mode("overwrite").parquet(s"$tmp/vids")
    runVerb("video-inspect", s"$tmp/vids", "id", "payload", s"$tmp/vi")
    val out = spark.read.parquet(s"$tmp/vi")
    val a = out.where(col("media_id") === 1L).head()
    assert(a.getAs[String]("format") == "avi" && a.getAs[Int]("width") == 160 &&
      a.getAs[Long]("duration_ms") == 1000L)
    assert(out.where(col("media_id") === 2L).head().isNullAt(1))
  }

  test("subtitles and video-text verbs run the video-text walk end to end") {
    val tmp = java.nio.file.Files.createTempDirectory("cli").toString
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // subtitles verb: markup-stripped cues out
    val vtt = "WEBVTT\n\n00:01.000 --> 00:02.000\n<v A>hi <i>x</i></v>\n"
    Seq((1L, vtt.getBytes("UTF-8")), (2L, "junk".getBytes("UTF-8")))
      .toDF("id", "payload").write.mode("overwrite").parquet(s"$tmp/subs")
    runVerb("subtitles", s"$tmp/subs", "id", "payload", s"$tmp/cues")
    val cues = spark.read.parquet(s"$tmp/cues")
    assert(cues.count() == 1)
    assert(cues.head().getAs[String]("text") == "hi x")
    // video-text verb: two identical DIB videos (near-dups: one
    // drops), one cue each → pairs only for the surviving video 1
    val w = 12; val h = 10
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val dib = new Array[Byte](rowBytes * h)
    (0 until h).foreach(r => (0 until w).foreach { x =>
      val o = r * rowBytes + x * 3
      dib(o) = (x * 7 + r).toByte; dib(o + 1) = (x + r * 3).toByte
      dib(o + 2) = (x * 2 + r * 5).toByte
    })
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def ck(id: String, p: Array[Byte]) = id.getBytes("US-ASCII") ++
      le32(p.length) ++ p ++ (if ((p.length & 1) == 1) Array[Byte](0) else Array[Byte]())
    def li(kind: String, b: Array[Byte]) = ck("LIST", kind.getBytes("US-ASCII") ++ b)
    val avi = ck("RIFF", "AVI ".getBytes("US-ASCII") ++
      li("hdrl",
        ck("avih", le32(40000) ++ Array.fill(12)(0.toByte) ++ le32(2) ++
          le32(0) ++ le32(1) ++ le32(0) ++ le32(w) ++ le32(h) ++
          Array.fill(16)(0.toByte)) ++
        li("strl",
          ck("strh", "vids".getBytes ++ "xxxx".getBytes ++
            Array.fill(48)(0.toByte)) ++
          ck("strf", le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
            le32(0) ++ Array.fill(16)(0.toByte)))) ++
      li("movi", ck("00db", dib) ++ ck("00db", dib)))
    Seq((1L, avi), (2L, avi)).toDF("id", "payload")
      .write.mode("overwrite").parquet(s"$tmp/vids")
    val srt = "1\n00:00:00,000 --> 00:00:00,100\nhello world\n"
    Seq((1L, srt.getBytes("UTF-8")), (2L, srt.getBytes("UTF-8")))
      .toDF("id", "payload").write.mode("overwrite").parquet(s"$tmp/vsubs")
    runVerb("video-text", s"$tmp/vids", s"$tmp/vsubs", "id", "payload",
      "payload", "40", s"$tmp/pairs")
    val pairs = spark.read.parquet(s"$tmp/pairs")
      .select("media_id", "cue_idx", "text", "key_frame", "scene_idx")
      .as[(Long, Int, String, Long, Long)].collect().toSeq
    // frame 1 (t=40) sits closer to the cue midpoint (50) than frame 0
    assert(pairs == Seq((1L, 0, "hello world", 1L, 0L)))
  }

  test("tar-media / zip-media verbs stream archives and PRINT fence counters") {
    val dir = java.nio.file.Files.createTempDirectory("cliarch").toFile
    import org.apache.spark.sql.functions.col
    // minimal valid 1x1 24bpp BMP (pixel B=10 G=20 R=30)
    val bmp = {
      val b = java.nio.ByteBuffer.allocate(58)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(58).putShort(0).putShort(0).putInt(54)
      b.putInt(40).putInt(1).putInt(1).putShort(1).putShort(24)
        .putInt(0).putInt(4).putInt(0).putInt(0).putInt(0).putInt(0)
      b.put(10.toByte).put(20.toByte).put(30.toByte).put(0.toByte)
      b.array()
    }
    // a zip (img + junk-text member), plus a junk "zip" for the fence
    val zipBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      z.putNextEntry(new java.util.zip.ZipEntry("a.bmp")); z.write(bmp); z.closeEntry()
      z.putNextEntry(new java.util.zip.ZipEntry("n.txt")); z.write("x".getBytes); z.closeEntry()
      z.close(); bos.toByteArray
    }
    java.nio.file.Files.write(new java.io.File(dir, "a.zip").toPath, zipBytes)
    java.nio.file.Files.write(new java.io.File(dir, "junk.zip").toPath,
      "not a zip".getBytes)
    // a tar with the same members, plus a junk "tar"
    val tarBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      Seq("a.bmp" -> bmp, "n.txt" -> "x".getBytes).foreach { case (name, body) =>
        val h = new Array[Byte](512)
        System.arraycopy(name.getBytes, 0, h, 0, name.length)
        def oct(v: Long, off: Int, len: Int): Unit = {
          val s = java.lang.Long.toOctalString(v)
          val p = ("0" * (len - 1 - s.length)) + s
          System.arraycopy(p.getBytes, 0, h, off, len - 1)
        }
        oct(420, 100, 8); oct(0, 108, 8); oct(0, 116, 8)
        oct(body.length, 124, 12); oct(0, 136, 12)
        h(156) = '0'.toByte
        java.util.Arrays.fill(h, 148, 156, ' '.toByte)
        var sum = 0L; (0 until 512).foreach(i => sum += h(i) & 0xff)
        val cs = java.lang.Long.toOctalString(sum)
        System.arraycopy((("0" * (6 - cs.length)) + cs).getBytes, 0, h, 148, 6)
        h(154) = 0; h(155) = ' '.toByte
        bos.write(h); bos.write(body)
        bos.write(new Array[Byte]((512 - body.length % 512) % 512))
      }
      bos.write(new Array[Byte](1024)); bos.toByteArray
    }
    java.nio.file.Files.write(new java.io.File(dir, "a.tar").toPath, tarBytes)
    java.nio.file.Files.write(new java.io.File(dir, "junk.tar").toPath,
      "definitely not tar headers".getBytes)
    // capture stdout: the fence line must PRINT after every run
    def captured(f: => Unit): String = {
      val bos = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(bos)) {
        scala.util.Try(f)
      }
      bos.toString("UTF-8")
    }
    val zOut = captured(runVerb("zip-media", dir.getAbsolutePath, s"$dir/zm"))
    assert(zOut.contains("[zip-media] files=2 members_out=2 dropped=1 " +
      "corrupt=0 entry_capped=0 members_truncated=0"), zOut)
    val zm = spark.read.parquet(s"$dir/zm")
    assert(zm.where(col("format") === "bmp").count() == 1)
    val tOut = captured(runVerb("tar-media", dir.getAbsolutePath, s"$dir/tm"))
    assert(tOut.contains("[tar-media] files=2 members_out=2 dropped=1 " +
      "corrupt=0 entry_capped=0 members_truncated=0"), tOut)
    val tm = spark.read.parquet(s"$dir/tm")
    assert(tm.where(col("format") === "bmp").count() == 1)
  }

  test("warc2wet verb converts a WARC file dir to the extracted-text table") {
    val dir = java.nio.file.Files.createTempDirectory("cli-wet").toFile
    def resp(uri: String, ctype: String, wire: String,
             body: Array[Byte]): Array[Byte] = {
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n" +
        wire + "\r\n").getBytes("ISO-8859-1") ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        http ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos); g.write(b); g.close()
      bos.toByteArray
    }
    val warc =
      resp("http://e/p", "text/html", "", "<p>plain page</p>".getBytes("UTF-8")) ++
      resp("http://e/z", "text/html", "Content-Encoding: gzip\r\n",
        gz("<p>gzipped page</p>".getBytes("UTF-8"))) ++
      resp("http://e/f", "application/rss+xml", "",
        ("<rss><channel><item><title>T</title>" +
          "<description>feed body</description></item></channel></rss>")
          .getBytes("UTF-8"))
    java.nio.file.Files.write(new java.io.File(dir, "a.warc").toPath, warc)
    runVerb("warc2wet", dir.getAbsolutePath, s"$dir/wet")
    val wet = spark.read.parquet(s"$dir/wet").orderBy("record_idx")
      .select("url", "carrier", "encoding", "text").collect()
    assert(wet.length == 3)
    assert(wet(0).getString(3) == "plain page" &&
      wet(0).getString(2) == "identity")
    assert(wet(1).getString(3) == "gzipped page" &&
      wet(1).getString(2) == "gzip")
    assert(wet(2).getString(1) == "rss" && wet(2).getString(3) == "T\nfeed body")
  }

  test("warc-redirects verb resolves 3xx chains to landing identities") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cli-redir").toFile
    def rec(uri: String, status: Int, extra: String): Array[Byte] = {
      val http = (s"HTTP/1.1 $status X\r\nContent-Type: text/html\r\n" +
        extra + "\r\n").getBytes("ISO-8859-1")
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        http ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
    val warc =
      rec("http://e/a", 301, "Location: /b\r\n") ++
      rec("http://e/b", 302, "Location: http://e/c\r\n") ++
      rec("http://e/ok", 200, "")
    Seq((1L, warc)).toDF("id", "payload")
      .write.mode("overwrite").parquet(s"$dir/in")
    runVerb("warc-redirects", s"$dir/in", "id", "payload", s"$dir/out", "5")
    val rows = spark.read.parquet(s"$dir/out")
      .select("src", "final_url", "hops", "terminal")
      .as[(String, String, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(rows == Seq(("http://e/a", "http://e/c", 2L, true),
      ("http://e/b", "http://e/c", 1L, true)))
  }
}
