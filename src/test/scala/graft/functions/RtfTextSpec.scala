package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Pins [[RtfToText]]: every declared transform, destination
  * skipping, unicode fallback skipping, hostile input, the Column
  * surface. */
class RtfTextSpec extends SparkSpec {
  import spark.implicits._

  private def c(rtf: String) = RtfToText.clean(rtf)

  test("control words: par/line/tab, formatting words drop, one-space " +
       "delimiter consumed") {
    assert(c("{\\rtf1 \\pard Plain text \\b bold\\b0  after.\\par done}") ==
      "Plain text bold after.\ndone")
    assert(c("{\\rtf1 a\\line b\\tab c}") == "a\nb\tc")
    // no delimiter space: the word ends at the non-alpha char
    assert(c("{\\rtf1 x\\b!y}") == "x!y")
  }

  test("escapes: hex cp1252, braces, backslash, \\~ space, unicode " +
       "with fallback skip") {
    assert(c("{\\rtf1 caf\\'e9 ok}") == "café ok")
    assert(c("{\\rtf1 \\{lit\\} \\\\slash}") == "{lit} \\slash")
    assert(c("{\\rtf1 Dr.\\~Who}") == "Dr. Who")
    assert(c("{\\rtf1 \\u8212?dash}") == "—dash")
    // \uc2: two fallback chars skip
    assert(c("{\\rtf1 \\uc2 \\u1055??px}") == "Пpx")
    // negative \u values wrap per the signed-16-bit rule: -26368 ->
    // U+9900, a BMP CJK char
    assert(c("{\\rtf1 \\u-26368?x}") == "餀x")
    // a wrapped SURROGATE half (-10179 -> U+D83D) drops — never a
    // lone surrogate in output — but its fallback char still skips
    assert(c("{\\rtf1 \\u-10179?x}") == "x")
  }

  test("\\uN fallback skip is group-scoped and only consumes literal " +
       "text, never control-word output") {
    // a \uN at the end of a group: the pending skip dies at the
    // closing brace — the char after the group is real text
    assert(c("{\\rtf1 {\\u228}x}") == "äx")
    assert(c("{\\rtf1 {\\uc2 \\u1055}xy}") == "Пxy")
    // fallback inside the group still skips; text after it emits
    assert(c("{\\rtf1 {\\u228 f}x}") == "äx")
    // \par's synthetic newline is NOT a fallback char: the skip
    // survives it and consumes the next literal instead
    assert(c("{\\rtf1 \\u228\\par xy}") == "ä\ny")
    // \tab and \emdash likewise pass through un-consumed
    assert(c("{\\rtf1 a\\u228\\tab xy}") == "aä\ty")
    // \'hh IS a fallback character (the spec's canonical form)
    assert(c("{\\rtf1 \\u228\\'61x}") == "äx")
  }

  test("destination groups drop: fonttbl, colortbl, info, pict, " +
       "starred, field instruction leg") {
    val rtf = "{\\rtf1{\\fonttbl{\\f0 Times;}}{\\colortbl;\\red0;}" +
      "{\\info{\\author secret}}{\\*\\generator MsftEdit 5.41;}" +
      "{\\pict 0102abcd}" +
      "kept text" +
      "{\\field{\\*\\fldinst HYPERLINK \"http://x\"}{\\fldrslt shown}}}"
    assert(c(rtf) == "kept text\nshown".replace("\n", "")
      || c(rtf) == "kept textshown")
    assert(!c(rtf).contains("Times") && !c(rtf).contains("secret") &&
      !c(rtf).contains("HYPERLINK") && !c(rtf).contains("abcd"))
  }

  test("raw newlines are not text; lines trim and empties drop") {
    assert(c("{\\rtf1 a\nb\r\nc}") == "abc")
    assert(c("{\\rtf1   \\par   x   \\par }") == "x")
    assert(c("{\\rtf1 \\par\\par\\par}") == "")
  }

  test("hostile input never throws: unbalanced braces, truncated " +
       "escapes, binary noise") {
    assert(c("{{{\\rtf1 deep") == "deep")
    assert(c("}}}stray") == "stray")
    assert(c("{\\rtf1 \\'") == "")
    assert(c("{\\rtf1 \\u99999999999?x}") == "x")
    val rnd = new scala.util.Random(59)
    (1 to 300).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(300))(
        (rnd.nextInt(96) + 32).toChar).mkString
      c(junk) // must not throw
    }
  }

  test("the Column surface cleans through the expression") {
    val rows = Seq(
      (1L, "{\\rtf1 hello \\b world\\b0 .}"),
      (2L, null.asInstanceOf[String]))
      .toDF("id", "rtf")
      .select(col("id"), RtfToText(col("rtf")).as("txt"))
      .orderBy("id").as[(Long, Option[String])].collect().toSeq
    assert(rows == Seq((1L, Some("hello world.")), (2L, None)))
  }
}
