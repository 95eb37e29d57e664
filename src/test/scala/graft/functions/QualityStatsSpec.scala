package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential pin for the fused [[QualityStats]] kernel: every
  * counter must equal its r19 column-tier formula exactly, and the
  * composed [[TextFunctions.qualityScore]] must be bit-identical to
  * the unfused arithmetic, on ASCII, unicode, whitespace-edge and
  * null inputs — these scores sit inside declared-query gates, so a
  * one-ulp drift flips oracle rows. */
class QualityStatsSpec extends SparkSpec {
  import spark.implicits._
  private val T = TextFunctions

  private val texts: Seq[String] = Seq(
    "the quick brown fox jumps over the lazy dog",
    "",
    " ",
    "  double  spaces  and trailing  ",
    "THE The the tHe", // stopword match is case-sensitive
    "a of and to in is it for on the", // all stopwords
    "no-stop words, only!! punct... 12345",
    "tabs\tand\nnewlines are NOT token separators",
    "unicode: café Über straße İstanbul",
    "cyrillic привет mixed with the latin",
    "emoji 😀 and 🍕 supplementary",
    "!!!???***", // pure punctuation
    "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 20 21 22",
    null)

  private def oldStopwordCount(c: org.apache.spark.sql.Column,
                               words: Seq[String]) =
    size(filter(split(c, " "), w => w.isin(words: _*))).cast("long")

  private def oldQuality(c: org.apache.spark.sql.Column,
                         words: Seq[String]) = {
    val tokenCount = size(split(c, " ")).cast("long")
    val punctRatio = length(regexp_replace(lower(c), "[a-z0-9 ]", ""))
      .cast("double") / greatest(length(c), lit(1)).cast("double")
    val lenScore = least(tokenCount.cast("double") / lit(20.0), lit(1.0))
    val stopScore = least(oldStopwordCount(c, words).cast("double") * lit(4.0) /
      greatest(tokenCount, lit(1L)).cast("double"), lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio * lit(4.0), lit(1.0))
    round((lenScore + stopScore + punctScore) / lit(3.0), 4)
  }

  test("each fused counter equals its r19 column formula") {
    val df = texts.toDF("t")
    val st = QualityStats(col("t"), T.defaultStopwords)
    val bad = df.select(col("t"),
        element_at(st, 1).as("tok_f"),
        element_at(st, 2).as("stop_f"),
        element_at(st, 3).as("na_f"),
        element_at(st, 4).as("len_f"),
        size(split(col("t"), " ")).cast("long").as("tok_o"),
        oldStopwordCount(col("t"), T.defaultStopwords).as("stop_o"),
        length(regexp_replace(lower(col("t")), "[a-z0-9 ]", ""))
          .cast("long").as("na_o"),
        length(col("t")).cast("long").as("len_o"))
      .where(!(col("tok_f") <=> col("tok_o")) ||
        !(col("stop_f") <=> col("stop_o")) ||
        !(col("na_f") <=> col("na_o")) ||
        !(col("len_f") <=> col("len_o")))
    assert(bad.count() == 0, bad.collect().mkString("\n"))
  }

  test("qualityScore is bit-identical to the unfused formula") {
    val df = texts.toDF("t")
    val bad = df.select(col("t"),
        T.qualityScore(col("t")).as("fused"),
        oldQuality(col("t"), T.defaultStopwords).as("old"))
      .where(!(col("fused") <=> col("old")))
    assert(bad.count() == 0, bad.collect().mkString("\n"))
  }

  test("fused counters agree on the sf fixture corpus") {
    val docs = graft.core.Tables.documents(spark, sf).limit(300)
    val st = QualityStats(col("text"), T.defaultStopwords)
    val bad = docs.select(
        T.qualityScore(col("text")).as("fused"),
        oldQuality(col("text"), T.defaultStopwords).as("old"))
      .where(!(col("fused") <=> col("old")))
    assert(bad.count() == 0)
  }

  test("interpreted eval agrees with codegen") {
    // force the interpreted path via a filter condition Spark cannot
    // whole-stage-compile in one go: evaluate directly
    val e = QualityStats(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("the  café!")),
      T.defaultStopwords)
    val got = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
    // "the  café!": tokens ["the","","café!"] → 3; stop "the" → 1;
    // lower = same; non-[a-z0-9 ]: é, ! → 2; length = 10 chars
    assert(got.toLongArray().toSeq == Seq(3L, 1L, 2L, 10L))
  }
}
