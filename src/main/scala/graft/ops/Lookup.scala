package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Point lookup on a keyed table — `MapFileOutputFormat.getEntry`
  * (.../lib/output/MapFileOutputFormat.java:49,115): the reference
  * keeps a sparse in-file index next to sorted data and seeks.
  *
  * Columnar equivalent: an equality filter. Parquet min/max row-group
  * statistics (plus the column index) skip every row group whose key
  * range excludes the value, so the read cost is O(matching row
  * groups), not O(table) — the same skip the MapFile index bought,
  * without maintaining a second structure. Sorting/bucketing the table
  * on the key (ops.Bucketing) tightens the min/max ranges and thus the
  * skip. */
object Lookup {

  def pointLookup(df: DataFrame, key: Column, value: Any): DataFrame =
    df.where(key === value)

  /** Lookup over a bucketed table: additionally prunes to the single
    * bucket file set owning the key's hash. */
  def pointLookupTable(spark: SparkSession, table: String,
                       keyCol: String, value: Any): DataFrame =
    spark.table(table).where(col(keyCol) === value)
}
