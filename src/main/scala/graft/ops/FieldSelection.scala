package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unix-`cut`-style field selection over delimited text, plus a
  * column-name variant for structured frames.
  *
  * Spec grammar mirrors the reference's
  * `mapreduce.fieldsel` specs (FieldSelectionMapper.java:50-57 /
  * FieldSelectionHelper.java:60 in
  * hadoop-mapreduce-client-core/.../lib/fieldsel/): a comma-separated
  * list of `n` (single field), `n-m` (inclusive range) or `n-`
  * (open-ended: field n to the last field), all 0-based.
  *
  * The parse result is a pure `Column` pipeline (split → element_at /
  * slice → concat_ws), so selection fuses into the scan under
  * whole-stage codegen and never materializes the token array for
  * open-ended ranges.
  */
object FieldSelection {

  sealed trait Spec
  final case class Single(i: Int) extends Spec
  final case class Range(from: Int, to: Int) extends Spec
  final case class OpenRange(from: Int) extends Spec

  def parseSpec(spec: String): Seq[Spec] =
    spec.split(",").toSeq.filter(_.nonEmpty).map { s =>
      s.split("-", -1) match {
        case Array(i)      => Single(i.trim.toInt)
        case Array(a, "")  => OpenRange(a.trim.toInt)
        case Array(a, b)   => Range(a.trim.toInt, b.trim.toInt)
        case _ => throw new IllegalArgumentException(s"bad field spec: $s")
      }
    }

  /** Select fields of a delimited text column per `spec`, re-joined
    * with `sep`. 0-based spec indices (as in the reference); empty
    * string for out-of-range singles (matching `cut`-like tolerance). */
  def selectFields(text: Column, spec: String, sep: String = "\t"): Column = {
    val parts = split(text, java.util.regex.Pattern.quote(sep))
    val pieces: Seq[Column] = parseSpec(spec).map {
      case Single(i)    => coalesce(try_element_at(parts, lit(i + 1)), lit(""))
      case Range(a, b)  => concat_ws(sep, slice(parts, a + 1, b - a + 1))
      case OpenRange(a) => concat_ws(sep, slice(parts, lit(a + 1), greatest(size(parts) - a, lit(0))))
    }
    concat_ws(sep, pieces: _*)
  }

  /** Column-name projection (the structured-era form of fieldsel). */
  def project(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*)
}
