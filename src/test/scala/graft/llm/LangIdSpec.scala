package graft.llm

import graft.SparkSpec

/** The discriminating fixture the synthetic corpus can't provide:
  * real function-word text per language must be identified correctly,
  * and ties must break to the alphabetically first profile. */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  test("function-word text identifies its language") {
    val docs = Seq(
      (1L, "the cat sat on the mat and the dog is in a box"),
      (2L, "der Hund ist nicht in das Haus und die Katze"),
      (3L, "le chat est dans la maison et les chiens des villes"),
      (4L, "el perro que y los gatos de una casa por las calles"),
      (5L, "我 是 他 的 朋友 了 在 家 有 不 少 书")).toDF("doc_id", "text")
    val got = LangId.predict(docs, "doc_id", "text")
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es", 5L -> "zh"), got.toString)
  }

  test("all-zero scores tie-break to the alphabetically first profile") {
    val docs = Seq((1L, "xyzzy plugh")).toDF("doc_id", "text")
    val row = LangId.predict(docs, "doc_id", "text").collect().head
    assert(row.getString(1) == "de" && row.getLong(2) == 0L, row.toString)
  }

  test("multiplicity counts: repeated stopwords are repeated evidence") {
    // 'de' appears in the es profile; 'des' in fr — craft a doc where
    // the raw fr hits outnumber es only through repetition
    val docs = Seq((1L, "des des des de")).toDF("doc_id", "text")
    val row = LangId.predict(docs, "doc_id", "text")
      .select("pred_lang", "s_fr", "s_es").as[(String, Long, Long)].collect().head
    assert(row == (("fr", 3L, 1L)), row.toString)
  }

  test("single-profile edge works and custom profiles apply") {
    val docs = Seq((1L, "foo bar foo")).toDF("doc_id", "text")
    val row = LangId.predict(docs, "doc_id", "text", Map("xx" -> Seq("foo")))
      .collect().head
    assert(row.getString(1) == "xx" && row.getLong(2) == 2L)
  }

  test("crawl tier: every language's sample identifies as itself, with confidence") {
    // the discriminative check across all ~30 profiles: each sample
    // must out-score every OTHER profile (shared-script siblings and
    // stopword collisions included), and score a positive confidence
    val docs = LangId.CrawlSamples.toSeq.sortBy(_._1).zipWithIndex
      .map { case ((lang, sample), i) => (i.toLong, lang, sample) }
      .toDF("doc_id", "lang", "text")
    val got = LangId.predictCrawl(docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang"), "doc_id")
      .select("lang", "pred_lang", "score", "total", "conf_bp")
      .as[(String, String, Long, Long, Long)].collect()
    got.foreach { case (lang, pred, score, total, conf) =>
      assert(pred == lang, s"$lang predicted as $pred")
      assert(score > 0 && total >= score, s"$lang score=$score total=$total")
      assert(conf == score * 10000 / total && conf > 0, s"$lang conf=$conf")
    }
    assert(got.length == LangId.CrawlProfiles.size && got.length >= 30)
  }

  test("crawl tier: script discrimination — kana beats Han for Japanese, " +
       "Cyrillic siblings split on function words") {
    val docs = Seq(
      (1L, "吾輩は猫である名前はまだ無い"), // ja: Han + kana mixed
      (2L, "软件工程需要大量的测试"), // zh: Han only
      (3L, "это не так как в прошлом году но что же"), // ru
      (4L, "це не так як у минулому році що й до того"), // uk
      (5L, "mixed latin text with the and of plus ไทยนิดหน่อย")) // en words dominate
      .toDF("doc_id", "text")
    val got = LangId.predictCrawl(docs, "doc_id", "text")
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(got(1L) == "ja", got.toString) // は/で/あ kana ×3 outweighs Han
    assert(got(2L) == "zh", got.toString)
    assert(got(3L) == "ru" && got(4L) == "uk", got.toString)
    // doc 5: 4 English function words (the/and/of/with) vs 11 Thai
    // chars — Thai script wins on raw chars; pin whichever the rule
    // says so drift is loud: th = 11 > en = 4
    assert(got(5L) == "th", got.toString)
  }

  test("single-pass ScriptBlockCounts agrees with the regexp_replace " +
       "formula on every profile range (differential)") {
    import org.apache.spark.sql.functions._
    val ranges: Seq[(Int, Int)] = LangId.CrawlProfiles.values.toSeq
      .flatMap(_.scripts.map(s => (s._1.toInt, s._2.toInt))).distinct.sorted
    val texts = LangId.CrawlSamples.values.toSeq ++ Seq(
      "plain ascii only",
      "mixed это ไทย 한국어 かな 中文 ωμέγα עברית مرحبا हिन्दी",
      "", "😀 emoji outside every block 🎉",
      "edge chars: Ѐӿ฀๿぀ゟ")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val viaExpr = df.select(col("id"),
      graft.functions.ScriptBlockCounts(col("text"), ranges).as("c"))
      .as[(Long, Seq[Long])].collect().toMap
    val viaRegex = df.select(
      (col("id") +: ranges.zipWithIndex.map { case ((f, t), k) =>
        (length(col("text")) - length(regexp_replace(col("text"),
          s"[${f.toChar}-${t.toChar}]", ""))).cast("long").as(s"r$k")
      }): _*).collect().map(r =>
        r.getLong(0) -> ranges.indices.map(k => r.getLong(k + 1))).toMap
    texts.indices.foreach { i =>
      assert(viaExpr(i.toLong) == viaRegex(i.toLong),
        s"text $i: ${texts(i)}")
    }
    // null text nulls out, and the expression survives a null column
    val n = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
      .select(graft.functions.ScriptBlockCounts(col("text"), ranges).as("c"))
      .collect()
    assert(n.head.isNullAt(0))
  }

  test("single-pass ProfileWordHits agrees with the filter/" +
       "array_contains formula on every profile (differential)") {
    import org.apache.spark.sql.functions._
    val langs = LangId.CrawlProfiles.keys.toSeq.sorted
    val wordLists = langs.map(l => LangId.CrawlProfiles(l).words)
    val texts = LangId.CrawlSamples.values.toSeq ++ Seq(
      "the the THE tHe of and", // multiplicity + case folding
      "  leading and trailing  ", // \s+ split's empty-token edge
      "de het een the der die el que", // words shared across profiles
      "tabs\tand\nnewlines the of", "", "no stopwords here xyzzy")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val viaExpr = df.select(col("id"),
      graft.functions.ProfileWordHits(col("text"), wordLists).as("h"))
      .as[(Long, Seq[Long])].collect().toMap
    val toks = split(lower(col("text")), "\\s+")
    val viaHof = df.select(
      (col("id") +: langs.zipWithIndex.map { case (l, k) =>
        val words = array(LangId.CrawlProfiles(l).words.map(lit): _*)
        (if (LangId.CrawlProfiles(l).words.isEmpty) lit(0L)
         else size(filter(toks, t => array_contains(words, t))).cast("long"))
          .as(s"w$k")
      }): _*).collect().map(r =>
        r.getLong(0) -> langs.indices.map(k => r.getLong(k + 1))).toMap
    texts.indices.foreach { i =>
      assert(viaExpr(i.toLong) == viaHof(i.toLong), s"text $i: ${texts(i)}")
    }
    val n = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
      .select(graft.functions.ProfileWordHits(col("text"), wordLists).as("h"))
      .collect()
    assert(n.head.isNullAt(0))
  }
}
