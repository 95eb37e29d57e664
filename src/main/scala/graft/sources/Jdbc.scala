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

  /** Batched-INSERT sink (DBOutputFormat). */
  def write(df: DataFrame, url: String, table: String,
            mode: SaveMode = SaveMode.Append,
            props: Properties = new Properties): Unit =
    df.write.mode(mode).jdbc(url, table, props)
}
