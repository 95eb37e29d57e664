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
}
