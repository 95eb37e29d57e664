package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-oriented defaults.
  *
  * Hadoop's execution machinery (sort-spill buffers, combiners, merge
  * fan-in, speculative execution — reference
  * hadoop-mapreduce-client-core/.../mapred/MapTask.java:889-1861) is all
  * supplied by Tungsten/AQE; what we own is the configuration posture:
  * AQE on (runtime coalesce + skew-join), zstd-compressed shuffle and
  * parquet, shuffle partitions sized for the active cluster rather than
  * the 200 default.
  */
object Engine {
  def session(appName: String = "graft",
              master: String = s"local[${Runtime.getRuntime.availableProcessors}]",
              shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .appName(appName)
      .master(master)
      .withExtensions(new GraftExtensions) // SQL names for native exprs
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // BloomMapFile's capability (io/BloomMapFile.java:54): prune the
      // probe side of large joins with a runtime-built bloom filter.
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
