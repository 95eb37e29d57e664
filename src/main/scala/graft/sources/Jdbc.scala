package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink — the capability of `DBInputFormat` /
  * `DataDrivenDBInputFormat` / `DBOutputFormat`
  * (.../lib/db/DBInputFormat.java:61, DataDrivenDBInputFormat.java:54,
  * DBOutputFormat.java:51).
  *
  * The reference's split strategy — partition the table by min/max
  * ranges of a split column — is exactly `spark.read.jdbc`'s
  * `partitionColumn/lowerBound/upperBound/numPartitions` contract, so
  * the wrappers only add the range discovery the reference did in
  * `getSplits`.
  */
object Jdbc {

  /** Single-partition read (small tables / dimension loads). */
  def read(spark: SparkSession, url: String, table: String,
           props: Properties = new Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Range-partitioned parallel read (DataDrivenDBInputFormat): bounds
    * are discovered with one MIN/MAX query when not supplied. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      splitColumn: String, numPartitions: Int,
                      bounds: Option[(Long, Long)] = None,
                      props: Properties = new Properties): DataFrame = {
    val (lo, hi) = bounds.getOrElse {
      val q = org.apache.spark.sql.jdbc.JdbcDialects.get(url).quoteIdentifier(splitColumn)
      val row = spark.read.jdbc(url,
        s"(SELECT MIN($q) AS lo, MAX($q) AS hi FROM $table) b", props).head()
      // MIN/MAX are NULL on an empty table — partition bounds are
      // meaningless there; read single-partition instead of NPEing.
      if (row.isNullAt(0) || row.isNullAt(1))
        return spark.read.jdbc(url, table, props)
      (row.getAs[Number](0).longValue, row.getAs[Number](1).longValue)
    }
    spark.read.jdbc(url, table, splitColumn, lo, hi, numPartitions, props)
  }

  /** Text-column range-partitioned read — the reference's TextSplitter
    * capability (.../lib/db/TextSplitter.java:40) that Spark's own
    * jdbc reader lacks: `partitionColumn` must be numeric/date there,
    * so a table whose only indexed key is a VARCHAR cannot be
    * split-read. Strings map order-preservingly onto base-65536
    * integers over their first 8 chars (position i contributes
    * `char << 16*(7-i)` — the same positional scheme TextSplitter
    * uses); MIN/MAX of the split column are mapped, the interval is
    * cut uniformly in exact integer arithmetic, and interior cuts map
    * back to boundary strings. Each range becomes one WHERE predicate
    * via `spark.read.jdbc(predicates)`: unbounded first/last ranges
    * plus an IS NULL leg on the first, so every row lands in exactly
    * one partition even if values drift outside the sampled MIN/MAX
    * between bound discovery and the read (the reference's splitter
    * anchors its ends the same way). Splits are range-uniform in the
    * char space, not row-uniform — same caveat as TextSplitter; AQE
    * coalesces small partitions downstream. */
  def readPartitionedText(spark: SparkSession, url: String, table: String,
                          splitColumn: String, numPartitions: Int,
                          props: Properties = new Properties): DataFrame = {
    require(numPartitions >= 1, s"numPartitions must be >= 1: $numPartitions")
    val q = org.apache.spark.sql.jdbc.JdbcDialects.get(url).quoteIdentifier(splitColumn)
    val row = spark.read.jdbc(url,
      s"(SELECT MIN($q) AS lo, MAX($q) AS hi FROM $table) b", props).head()
    if (numPartitions == 1 || row.isNullAt(0) || row.isNullAt(1))
      return spark.read.jdbc(url, table, props)
    val cuts = textCuts(row.getString(0), row.getString(1), numPartitions)
    if (cuts.isEmpty) return spark.read.jdbc(url, table, props)
    // boundary strings land inside SQL literals — double any quotes
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    // Ranges are mutually exclusive BY CONSTRUCTION, not by cut
    // ordering: the cuts ascend in Java UTF-16 order, but the
    // predicates run under the DATABASE's collation (case-insensitive
    // and locale collations — MySQL/SQL Server defaults — can order
    // the same strings differently), so `>= a AND < b` windows built
    // from adjacent cuts could overlap there and read rows twice.
    // Instead each leg takes `< cut_i` AND the negation of every
    // earlier leg's test: for ANY deterministic comparison a row
    // matches exactly the leg of its smallest satisfied cut (or the
    // all-negations last leg), and NULL only the IS NULL leg. Under a
    // binary collation the extra conjuncts are redundant and index
    // range scans still apply; the literal count is O(partitions²),
    // immaterial next to the read.
    val ls = cuts.map(lit)
    def geEarlier(i: Int) = (0 until i).map(j => s"$q >= ${ls(j)}")
    val preds =
      Seq(s"$q < ${ls.head} OR $q IS NULL") ++
        (1 until cuts.length).map { i =>
          (s"$q < ${ls(i)}" +: geEarlier(i)).mkString(" AND ")
        } ++
        Seq(geEarlier(cuts.length).mkString(" AND "))
    spark.read.jdbc(url, table, preds.toArray, props)
  }

  /** Up to `numPartitions - 1` interior boundary strings strictly
    * ordered ascending (possibly fewer — a narrow [lo, hi] interval
    * cannot be cut `numPartitions` ways). The common prefix of the
    * bounds is stripped before mapping and re-attached to every cut
    * (TextSplitter does the same) — otherwise keys like
    * `Customer#000000001 .. Customer#000001500`, identical in their
    * first `depth` chars, would look like an empty interval. Exact
    * BigInt math: no floating-point drift at depth 8 (65536^8 = 2^128
    * overflows any primitive). */
  private[sources] def textCuts(lo0: String, hi0: String, numPartitions: Int): Seq[String] = {
    val common = lo0.zip(hi0).takeWhile { case (x, y) => x == y }.length
    val prefix = lo0.take(common)
    val (lo, hi) = (lo0.drop(common), hi0.drop(common))
    val depth = 8
    def toBig(s: String): BigInt =
      (0 until depth).map { i =>
        BigInt(if (i < s.length) s.charAt(i).toInt else 0) << (16 * (depth - 1 - i))
      }.sum
    def toStr(v: BigInt): String = {
      val sb = new StringBuilder
      (0 until depth).foreach { i =>
        var c = ((v >> (16 * (depth - 1 - i))) & 0xFFFF).toInt
        // lone surrogates are not valid in SQL string literals; clamp
        // below the surrogate block (boundaries need only be valid and
        // ordered, not exact interpolations)
        if (c >= 0xD800 && c <= 0xDFFF) c = 0xD7FF
        sb.append(c.toChar)
      }
      // NULs are padding, not content - and an embedded NUL would be
      // hostile inside a SQL literal; truncating at the first one keeps
      // the boundary valid and still inside (lo, hi)
      sb.toString.takeWhile(_ != '\u0000')
    }
    val (a, b) = (toBig(lo), toBig(hi))
    if (b <= a) return Seq.empty
    val raw = (1 until numPartitions).map(k => a + (b - a) * k / numPartitions)
    // sort + distinct guarantees non-overlapping ranges even if the
    // surrogate clamp perturbed an interpolated value
    raw.map(toStr).filter(s => s > lo && s < hi).distinct.sorted
      .map(prefix + _)
  }

  /** Batched-INSERT sink (DBOutputFormat). */
  def write(df: DataFrame, url: String, table: String,
            mode: SaveMode = SaveMode.Append,
            props: Properties = new Properties): Unit =
    df.write.mode(mode).jdbc(url, table, props)
}
