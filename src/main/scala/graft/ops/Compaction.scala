package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Small-file compaction — the capability of HAR archives
  * (hadoop-tools/hadoop-archives/.../HadoopArchives.java:84): pack many
  * small files into few large ones. In a columnar engine this is a
  * rewrite job: read, coalesce to a target file count, write.
  *
  * `coalesce` (not `repartition`) so compaction is shuffle-free: it
  * only merges read-splits. Target count derives from total input
  * bytes, so the same call is correct at 100 TB (thousands of output
  * files) and in tests (one).
  */
object Compaction {

  val DefaultTargetBytes: Long = 512L * 1024 * 1024

  def targetFileCount(totalBytes: Long, targetFileBytes: Long = DefaultTargetBytes): Int =
    math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)

  /** Compact a parquet directory into ~targetFileBytes files at
    * `outPath`. Returns the output file count. */
  def compactParquet(spark: SparkSession, inPath: String, outPath: String,
                     targetFileBytes: Long = DefaultTargetBytes): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inPath), spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(inPath)).getLength
    val n = targetFileCount(totalBytes, targetFileBytes)
    spark.read.parquet(inPath).coalesce(n)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    n
  }
}
