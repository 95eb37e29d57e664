package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document repetition statistics (the
  * [[graft.llm.Repetition]] hot loop): text in, one struct of counts
  * out, all in plain JVM code — splitting, n-gram construction and
  * frequency counting cost interpreted-HOF evaluation otherwise
  * (`transform`/`slice`/`aggregate` allocate per element; measured
  * ~3.5× slower at sf0.1 even after hoisting the token arrays out of
  * the lambdas). Same fusion pattern as [[MinHashSignature]].
  *
  * Unit semantics mirror the Column tier exactly:
  * lines = `split('\n')`, space-trimmed (ASCII 0x20 only, matching
  * Spark `trim`), empties dropped; words = `split('\s+')`, empties
  * dropped; n-grams join `n` consecutive words with one space. All
  * "char" counts are codepoint counts, matching Spark `length`.
  *
  * Returns `struct(n_lines, distinct_lines, dup_line_chars,
  * top_gram_cover, dup_gram_chars)`: total and distinct line counts,
  * characters inside lines occurring >1 times (all occurrences), the
  * best single `topN`-gram `count × length` cover, and characters
  * inside duplicated `dupN`-grams.
  */
case class RepetitionStats(child: Expression, topN: Int, dupN: Int)
    extends UnaryExpression with UnaryKernelCodegen {

  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("distinct_lines", LongType, nullable = false),
    StructField("dup_line_chars", LongType, nullable = false),
    StructField("top_gram_cover", LongType, nullable = false),
    StructField("dup_gram_chars", LongType, nullable = false)))

  override def prettyName: String = "repetition_stats"

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  /** Spark `trim` semantics: strip ASCII spaces only (Java's
    * `String.trim` also strips tabs/controls — different function). */
  private def trimSpaces(s: String): String = {
    var from = 0; var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    if (from == 0 && to == s.length) s else s.substring(from, to)
  }

  private def chars(s: String): Long = s.codePointCount(0, s.length).toLong

  /** count map -> (distinct, dupChars, topCover) in one pass */
  private def runStats(counts: java.util.HashMap[String, Long]): (Long, Long, Long) = {
    var distinct = 0L; var dup = 0L; var top = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cover = e.getValue * chars(e.getKey)
      distinct += 1
      if (e.getValue > 1) dup += cover
      if (cover > top) top = cover
    }
    (distinct, dup, top)
  }

  private def gramCounts(words: Array[String], n: Int): java.util.HashMap[String, Long] = {
    val m = new java.util.HashMap[String, Long]()
    var i = 0
    val last = words.length - n
    val sb = new java.lang.StringBuilder()
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      m.merge(sb.toString, 1L, (a, b) => a + b)
      i += 1
    }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString

    val lineCounts = new java.util.HashMap[String, Long]()
    var nLines = 0L
    text.split("\n").foreach { raw =>
      val l = trimSpaces(raw)
      if (l.nonEmpty) {
        nLines += 1
        lineCounts.merge(l, 1L, (a, b) => a + b)
      }
    }
    val (distinctLines, dupLineChars, _) = runStats(lineCounts)

    val words = ws.split(text).filter(_.nonEmpty)
    val (_, _, topCover) = runStats(gramCounts(words, topN))
    val (_, dupGramChars, _) = runStats(gramCounts(words, dupN))

    InternalRow(nLines, distinctLines, dupLineChars, topCover, dupGramChars)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
