package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text folding — the normalization pass a multilingual
  * curation pipeline runs before dedup/hashing so that visually
  * identical strings hash identically: NFC-compose (a decomposed
  * `e` + U+0301 and a precomposed `é` become the same code point),
  * strip diacritic marks (NFD, drop the Mn combining class), and
  * lower-case (root locale — no Turkish-ı surprises). Matches
  * DuckDB's `lower(strip_accents(nfc_normalize(text)))` — the q238
  * oracle replays it verbatim cross-engine.
  *
  * Spark has no built-in Unicode normalizer, so this is a native
  * expression over `java.text.Normalizer` (both implement the
  * Unicode standard algorithms, so the engines agree by spec, not by
  * luck). Whitespace handling deliberately stays OUT: compose with
  * `regexp_replace(col, "\\s+", " ")` where collapse is wanted. */
case class FoldText(child: Expression) extends UnaryExpression with UnaryKernelCodegen {

  override def dataType: DataType = StringType
  override def prettyName: String = "fold_text"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val nfc = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    val nfd = java.text.Normalizer.normalize(nfc, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    // walk CODE POINTS: a per-char walk would classify the surrogate
    // halves of a non-BMP combining mark (e.g. U+1D165) as SURROGATE
    // and let the mark through un-stripped
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    // re-compose what survives (base letters unaffected; kept
    // composed forms like Hangul stay canonical)
    val stripped = java.text.Normalizer.normalize(
      sb.toString, java.text.Normalizer.Form.NFC)
    UTF8String.fromString(stripped.toLowerCase(java.util.Locale.ROOT))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object FoldText {
  def apply(text: Column): Column =
    ColumnBridge.column(FoldText(ColumnBridge.expression(text)))
}
