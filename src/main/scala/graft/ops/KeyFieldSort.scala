package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unix-`sort(1)`-style `-k` sort specs over delimited text columns.
  *
  * Mirrors the semantics of the reference's
  * `KeyFieldBasedComparator` / `KeyFieldBasedPartitioner`
  * (hadoop-mapreduce-client-core/.../lib/partition/
  * KeyFieldBasedComparator.java:53, KeyFieldBasedPartitioner.java:51):
  * each spec is `-k pos1[,pos2][n][r]` with 1-based field positions,
  * `n` = numeric compare, `r` = reverse. We support the field-level
  * subset (no mid-field character offsets) — the overwhelmingly common
  * case in streaming jobs.
  *
  * Instead of a byte comparator + custom partitioner, the parse result
  * is a list of `Column` sort expressions handed to `orderBy`, so
  * Spark's `RangePartitioner` (sampling) + Tungsten binary sort give
  * total order at any scale with zero custom shuffle machinery.
  */
object KeyFieldSort {

  /** `to == None` means "through the last field" — `sort(1)`'s
    * `-kPOS1` without POS2 compares from POS1 to end of line. */
  final case class KeySpec(from: Int, to: Option[Int], numeric: Boolean, reverse: Boolean)

  private val SpecRe = "-k\\s*(\\d+)(?:,(\\d+))?([nr]*)".r

  def parse(spec: String): Seq[KeySpec] =
    SpecRe.findAllMatchIn(spec).map { m =>
      val from = m.group(1).toInt
      val to = Option(m.group(2)).map(_.toInt)
      val flags = Option(m.group(3)).getOrElse("")
      KeySpec(from, to, flags.contains('n'), flags.contains('r'))
    }.toSeq

  /** Sort expressions for `orderBy` over a delimited `text` column.
    * Open-ended non-numeric keys compare the rest of the line as one
    * string (separators included), matching `sort(1)`; open-ended
    * NUMERIC keys use the first field only (`sort -n` reads the
    * leading numeric prefix — a single field here). */
  def sortColumns(text: Column, spec: String, sep: String = "\t"): Seq[Column] = {
    val parts = split(text, java.util.regex.Pattern.quote(sep))
    def field(i: Int) = coalesce(try_element_at(parts, lit(i)), lit(""))
    parse(spec).flatMap { ks =>
      val keys: Seq[Column] = ks.to match {
        case Some(to) => (ks.from to to).map(i => field(i))
        case None if ks.numeric => Seq(field(ks.from))
        case None =>
          Seq(concat_ws(sep, slice(parts, lit(ks.from),
            greatest(size(parts) - (ks.from - 1), lit(0)))))
      }
      keys.map { f =>
        // try_cast: sort(1) treats non-numeric/missing fields as 0-ish,
        // never crashes; a plain cast throws under Spark 4 ANSI mode
        val typed = if (ks.numeric) f.try_cast("double") else f
        if (ks.reverse) typed.desc else typed.asc
      }
    }
  }

  /** Total-order sort of a delimited text frame by a `-k` spec. */
  def sorted(df: DataFrame, textCol: String, spec: String, sep: String = "\t"): DataFrame =
    df.orderBy(sortColumns(col(textCol), spec, sep): _*)

  /** Partition (without total sort) by the key fields — the
    * `KeyFieldBasedPartitioner` capability: co-locate records sharing
    * the key fields, e.g. ahead of a reduce-side `pipe()`. */
  def partitioned(df: DataFrame, textCol: String, spec: String,
                  numPartitions: Int, sep: String = "\t"): DataFrame = {
    val parts = split(col(textCol), java.util.regex.Pattern.quote(sep))
    val keys = parse(spec).flatMap(ks =>
      (ks.from to ks.to.getOrElse(ks.from))
        .map(i => coalesce(try_element_at(parts, lit(i)), lit(""))))
    if (keys.isEmpty) df.repartition(numPartitions)
    else df.repartition(numPartitions, keys: _*)
  }
}
