package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Pins [[Repetition.signals]] against hand-computed fixtures: the
  * line family (dup fraction + char fraction), the top-n-gram cover,
  * the duplicated-n-gram cover (including its documented
  * overlap-counted >1 upper-bound behavior), and the degenerate
  * short/empty documents.
  */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def sig(rows: (Long, String)*): Map[Long, Row] =
    Repetition.signals(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

  private def d(r: Row, i: Int): Double = r.getDouble(i)

  test("repeated lines: dup_line_frac and char fraction") {
    // lines aa,bb,aa,cc,bb,aa -> 6 lines, 3 distinct; len 17 chars
    val r = sig(1L -> "aa\nbb\naa\ncc\nbb\naa")(1L)
    assert(r.getLong(1) == 6, "n_lines")
    assert(d(r, 2) == 0.5, "dup_line_frac = 1 - 3/6")
    // aa (3x2 chars) + bb (2x2 chars) = 10 of 17 chars in dup lines
    assert(math.abs(d(r, 3) - 10.0 / 17) < 1e-12, "dup_line_char_frac")
    // tokens split on \s+ cross the newlines: top 2-gram "bb aa" x2,
    // cover 2*5 of 17; 5-grams are the two distinct windows -> 0
    assert(math.abs(d(r, 4) - 10.0 / 17) < 1e-12, "top_ngram_char_frac")
    assert(d(r, 5) == 0.0, "dup_ngram_char_frac")
  }

  test("repeated n-grams: top cover, and overlap-counted dup cover > 1") {
    val r = sig(2L -> "x y x y x y x y")(2L) // 15 chars, one line
    assert(r.getLong(1) == 1 && d(r, 2) == 0.0 && d(r, 3) == 0.0)
    // "x y" occurs 4 times, cover 4*3 = 12 of 15
    assert(math.abs(d(r, 4) - 0.8) < 1e-12, "top_ngram_char_frac")
    // both 5-grams occur twice; covers 2*9 + 2*9 = 36 of 15 -> 2.4,
    // the documented overlap upper bound (can exceed 1)
    assert(math.abs(d(r, 5) - 2.4) < 1e-12, "dup_ngram_char_frac")
  }

  test("degenerate docs: single word scores zero, empty text scores zero") {
    val m = sig(3L -> "short", 4L -> "")
    val r = m(3L)
    assert(r.getLong(1) == 1 && (2 to 5).forall(i => d(r, i) == 0.0))
    val e = m(4L) // map-only: empty docs still get a (zero) row
    assert(e.getLong(1) == 0 && (2 to 5).forall(i => d(e, i) == 0.0))
  }

  test("blank-line and whitespace handling: lines trimmed, empties dropped") {
    // lines: "a", "a" (the "  " line trims away); 6 chars total
    val r = sig(5L -> "a\n  \na")(5L)
    assert(r.getLong(1) == 2 && d(r, 2) == 0.5)
    // dup line "a": 2 occurrences x 1 char of 6 chars
    assert(math.abs(d(r, 3) - 2.0 / 6) < 1e-12)
  }
}
