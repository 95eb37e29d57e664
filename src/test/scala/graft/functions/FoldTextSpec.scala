package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[FoldText]] beyond the q238 oracle: composed/decomposed
  * convergence (the reason the op exists), idempotence, non-Latin
  * pass-through, and null propagation. */
class FoldTextSpec extends SparkSpec {
  import spark.implicits._

  private def fold(ss: (String, String)*): Map[String, String] =
    ss.toSeq.toDF("in", "label")
      .select(col("label"), FoldText(col("in")).as("out"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("precomposed and decomposed accent sequences fold identically") {
    val out = fold(
      "Café" -> "pre",         // é precomposed
      "Café" -> "dec",        // e + COMBINING ACUTE
      "résumé" -> "pre2",
      "résumé" -> "dec2")
    assert(out("pre") == "cafe" && out("dec") == "cafe")
    assert(out("pre2") == "resume" && out("dec2") == "resume")
  }

  test("diacritics strip, case folds, non-Latin text passes through") {
    val out = fold(
      "Zürich" -> "u",         // ü -> u
      "señor" -> "n",          // ñ -> n
      "façade" -> "c",         // ç -> c
      "ÀÉÎÕÜ" -> "caps",
      "日本語テキスト" -> "cjk",       // no diacritics, no case: unchanged
      "ASCII only 123" -> "ascii")
    assert(out("u") == "zurich" && out("n") == "senor" && out("c") == "facade")
    assert(out("caps") == "aeiou")
    assert(out("cjk") == "日本語テキスト")
    assert(out("ascii") == "ascii only 123")
  }

  test("non-BMP combining marks (surrogate pairs) strip like BMP ones") {
    // U+1D167 MUSICAL SYMBOL COMBINING TREMOLO-1 is category Mn and
    // lives outside the BMP: a per-char walk would see two surrogate
    // halves (category SURROGATE) and let it through
    val in = "do" + new String(Character.toChars(0x1D167)) + "re"
    assert(fold(in -> "x")("x") == "dore")
  }

  test("SQL surface (fold_text) agrees with the column function") {
    graft.core.GraftExtensions.register(spark)
    Seq("Café", "Zürich STRASSE").toDF("t").createOrReplaceTempView("ftx")
    val viaSql = spark.sql("SELECT fold_text(t) FROM ftx")
      .as[String].collect().toSeq
    assert(viaSql == Seq("cafe", "zurich strasse"))
  }

  test("idempotent and null-propagating") {
    val once = fold("Créème BRÛLÉE" -> "x")("x")
    assert(fold(once -> "y")("y") == once)
    val r = Seq((1L, null.asInstanceOf[String])).toDF("id", "t")
      .select(FoldText(col("t"))).head()
    assert(r.isNullAt(0))
  }
}
