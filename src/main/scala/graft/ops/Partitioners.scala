package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's partitioner family as repartitioning helpers
  * (.../lib/partition/HashPartitioner.java:28,
  * BinaryPartitioner.java:71, RehashPartitioner.java:35,
  * KeyFieldBasedPartitioner — the last lives in [[KeyFieldSort]]).
  *
  * In Spark, "partitioner" is just the expression handed to
  * `repartition`: Murmur3 (`hash`) is already uniform, which is the
  * entire purpose RehashPartitioner served, so `rehash` == `byKey`.
  */
object Partitioners {

  /** HashPartitioner: co-locate by key columns (Murmur3). */
  def byKey(df: DataFrame, numPartitions: Int, keys: Column*): DataFrame =
    df.repartition(numPartitions, keys: _*)

  /** BinaryPartitioner: hash over a configurable byte range of a
    * binary key — `from`/`to` are 1-based inclusive byte offsets
    * (negative `to` counts from the end, as in the reference). */
  def byBinaryRange(df: DataFrame, numPartitions: Int, key: Column,
                    from: Int, to: Int): DataFrame = {
    val len = length(key)
    val toPos = if (to >= 0) lit(to) else len + lit(to + 1)
    val slice = substr(key, lit(from), greatest(toPos - from + 1, lit(0)))
    df.repartition(numPartitions, hash(slice))
  }

  /** Partition id each row would land in — for tests/diagnostics. */
  def partitionIdOf(df: DataFrame): DataFrame = {
    require(!df.columns.contains("__pid"), "input already has a __pid column")
    df.withColumn("__pid", spark_partition_id())
  }
}
