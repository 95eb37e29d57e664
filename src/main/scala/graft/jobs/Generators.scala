package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic distributed data generators — the capability of the
  * reference's synthetic sources (EX/RandomWriter.java:78,
  * EX/RandomTextWriter.java:77, EX/terasort/TeraGen.java:67), all as
  * `spark.range`-driven map-only plans: no driver data, no RNG state,
  * any scale, reproducible (hash-of-index in place of seeded RNG
  * streams).
  */
object Generators {

  private val words = Vector(
    "the", "data", "spark", "sort", "merge", "join", "stream", "filter",
    "table", "query", "row", "key", "value", "shuffle", "reduce", "map",
    "scan", "group", "index", "batch", "window", "event", "user", "doc")

  /** Skewed word-soup text (RandomTextWriter shape): `rows` documents
    * of ~`wordsPerDoc` words drawn Zipf-ishly from a fixed vocabulary. */
  def randomText(spark: SparkSession, rows: Long, wordsPerDoc: Int = 50,
                 partitions: Int = 32): DataFrame = {
    val n = words.length
    // Zipf-ish skew: word index = floor(n * u^2) for u uniform from hash
    val wordAt = (j: org.apache.spark.sql.Column) => {
      val u = (pmod(xxhash64(col("id"), j), lit(10000L)).cast("double") / 10000.0)
      val idx = floor(pow(u, 2.0) * n).cast("int")
      element_at(lit(words.toArray), least(idx, lit(n - 1)) + 1)
    }
    spark.range(0, rows, 1, partitions)
      .select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(wordsPerDoc)),
          j => wordAt(j))).as("text"))
  }

  /** Random-looking (but deterministic) integer k/v pairs
    * (RandomWriter / TestMapReduce fixtures). */
  def randomKV(spark: SparkSession, rows: Long, keyRange: Long = 1000000L,
               partitions: Int = 32): DataFrame =
    spark.range(0, rows, 1, partitions).select(
      pmod(xxhash64(col("id")), lit(keyRange)).as("key"),
      pmod(xxhash64(col("id"), lit(1)), lit(1000000007L)).as("value"))
}
