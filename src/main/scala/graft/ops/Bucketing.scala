package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned, pre-sorted) tables — the real equivalent
  * of the reference's map-side merge join contract
  * (CompositeInputFormat.java:56 requires all inputs identically
  * partitioned AND sorted on disk; MapFileOutputFormat.java:49 is the
  * sorted-indexed layout).
  *
  * Writing with `bucketBy(n, key).sortBy(key)` records the layout in
  * the catalog; joins and aggregations on the bucket key then plan
  * WITHOUT a shuffle (no Exchange in the physical plan — asserted in
  * BucketingSpec). At 100 TB this converts every fact-fact join on a
  * shared key from a full network shuffle into a local merge, which is
  * the single biggest cost lever in the engine.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. One file per
    * bucket (repartition on the key first) so the sort metadata is
    * usable by the reader. */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int,
                    key: String, moreKeys: String*): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartition(numBuckets, (key +: moreKeys).map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key, moreKeys: _*)
      .sortBy(key, moreKeys: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Equi-join two bucketed tables on their bucket key — plans as a
    * shuffle-free sort-merge join when bucket specs match. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
