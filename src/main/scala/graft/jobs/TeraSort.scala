package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TeraSort-equivalent benchmark workload: deterministic generation of
  * 100-byte records (10-byte key + 90-byte payload), global sort by
  * key, and TeraValidate-style self-validation (global order + checksum
  * equality).
  *
  * Mirrors the capabilities of EX/terasort/TeraGen.java:67,
  * TeraSort.java:49 and TeraValidate.java:52 in the reference. The
  * reference needs a sampled trie `TotalOrderPartitioner`; Spark's
  * `orderBy` range-partitions by reservoir sampling internally, so the
  * whole "write partition file" machinery collapses into one
  * declarative sort.
  */
object TeraSort {

  /** Deterministic 100-byte-ish records: key = 10-hex-char md5 prefix
    * of the row index (uniformly distributed, like TeraGen's random
    * keys but reproducible), value = 90-char payload derived from the
    * index. Generated distributed via `spark.range` — no driver data. */
  def gen(spark: SparkSession, rows: Long, partitions: Int = 32): DataFrame =
    spark.range(0, rows, 1, partitions).select(
      substring(md5(col("id").cast("string").cast("binary")), 1, 10).as("key"),
      rpad(concat(lit("row-"), col("id").cast("string")), 90, "x").as("value"))

  def sort(df: DataFrame): DataFrame = df.orderBy("key", "value")

  /** TeraValidate: proves (1) global order — each partition is locally
    * ordered and partition boundary maxima/minima interleave — and
    * (2) content preservation — xor-of-hashes checksum matches the
    * input's (order-insensitive, so it catches loss/duplication).
    * ONE pass over the sorted output: per partition, (min, max,
    * locally-sorted, count, xor-hash) in the same iterator, then an
    * O(partitions) driver-side merge check — the TeraValidate shape
    * (EX/terasort/TeraValidate.java:52,87) without a second job.
    * Returns (rowCount, checksum) on success; throws on violation. */
  def validate(sorted: DataFrame, expectedChecksum: Long, expectedRows: Long): (Long, Long) = {
    val spark = sorted.sparkSession
    import spark.implicits._
    val parts = sorted.select(col("key"), xxhash64(col("key"), col("value")).as("h"))
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var min: String = null; var max: String = null; var prev: String = null
        var ok = true; var n = 0L; var xor = 0L
        while (it.hasNext) {
          val row = it.next()
          val k = row.getString(0)
          if (min == null) min = k
          if (prev != null && prev > k) ok = false
          prev = k; max = k; n += 1; xor ^= row.getLong(1)
        }
        Iterator.single((pid, Option(min), Option(max), ok, n, xor))
      }.collect().sortBy(_._1)
    val nonEmpty = parts.filter(_._5 > 0)
    require(nonEmpty.forall(_._4), "partition not locally sorted")
    nonEmpty.sliding(2).foreach {
      case Array(a, b) => require(a._3.get <= b._2.get,
        s"partition boundary out of order: ${a._3.get} > ${b._2.get}")
      case _ =>
    }
    val rows = parts.map(_._5).sum
    require(rows == expectedRows, s"row count $rows != expected $expectedRows")
    val checksum = parts.map(_._6).fold(0L)(_ ^ _)
    require(checksum == expectedChecksum, "checksum mismatch after sort")
    (rows, checksum)
  }

  /** Order-insensitive content checksum: xor of per-row xxhash64. */
  def checksumOf(df: DataFrame): Long = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(xxhash64(col("key"), col("value")).as("h")).as[Long]
      .rdd.fold(0L)(_ ^ _)
  }

  /** End-to-end run: gen (cached) → checksum → sort → validate.
    * Returns seconds for the timed sort+validate phase. */
  def run(spark: SparkSession, rows: Long): Double = {
    val input = gen(spark, rows).persist()
    try {
      val expected = checksumOf(input)
      val t0 = System.nanoTime()
      val sorted = sort(input)
      validate(sorted, expected, rows)
      (System.nanoTime() - t0) / 1e9
    } finally input.unpersist()
  }
}
