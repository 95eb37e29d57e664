package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the fixture tables (TESTDATA.md): one parquet per table
  * under a scale-factor directory. Centralizing the reads keeps schema
  * assumptions in one place and lets Catalyst push filters/projections
  * into every scan (the engine's equivalent of Hadoop's
  * `FileInputFormat` split planning — reference
  * hadoop-mapreduce-client-core/.../lib/input/FileInputFormat.java:69 —
  * which Spark's FileSourceScanExec supplies natively).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` arrives in whatever physical form the fixture
    * generator used: TIMESTAMP(NANOS) (read as long via the legacy
    * flag, truncated to micros — the same truncation DuckDB applies on
    * `CAST(ts AS TIMESTAMP)`) or naive TIMESTAMP(MICROS)
    * (isAdjustedToUTC=false, which Spark 4 infers as TIMESTAMP_NTZ —
    * cast to TIMESTAMP under the pinned UTC session zone, bit-identical
    * micros). Normalizing HERE keeps every consumer — unix_micros,
    * session_window, watermarks — on plain TimestampType. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every fixture table as a temp view so `spark.sql` can be
    * used against the same names the DuckDB oracle sees. `events` goes
    * through its dedicated loader (nanos handling). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach {
      case "events" => events(spark, sfDir).createOrReplaceTempView("events")
      case n        => load(spark, sfDir, n).createOrReplaceTempView(n)
    }
}
