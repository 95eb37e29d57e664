package graft.core

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Pins the two reference capabilities the engine gets from Spark's
  * file-scan and file-write machinery rather than from code of its
  * own, so a regression in posture (conf drift, Spark behavior change)
  * fails a test instead of silently degrading at scale.
  */
class PostureSpec extends SparkSpec {

  test("small files pack into few partitions (CombineFileInputFormat posture)") {
    // CombineFileInputFormat (.../lib/input/CombineFileInputFormat.java:59)
    // exists because one-task-per-small-file destroys job startup at
    // scale. Spark's FilePartition bin-packs by maxPartitionBytes +
    // openCostInBytes — write 40 tiny files, expect far fewer tasks.
    val dir = java.nio.file.Files.createTempDirectory("combine").toString
    (1 to 40).foreach { i =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/f$i.csv"), s"$i,row$i\n")
    }
    val df = spark.read.schema("id INT, name STRING").csv(s"$dir/*.csv")
    assert(df.count() == 40)
    // packing floors at spark.sql.files.minPartitionNum (defaults to
    // defaultParallelism) — the posture is tasks ∝ cores, NOT ∝ files
    val parts = df.rdd.getNumPartitions
    val cores = spark.sparkContext.defaultParallelism
    assert(parts <= cores,
      s"40 tiny files should pack into <=$cores partitions, got $parts")
  }

  test("empty partitions write no files (LazyOutputFormat posture)") {
    // LazyOutputFormat (.../lib/output/LazyOutputFormat.java:37) exists
    // to suppress empty part files. Spark's FileFormatWriter only
    // creates a file when a partition has rows — assert that, since a
    // 10k-task job writing 9k empty files is a real small-file problem.
    // 8 partitions; keep one row in partitions 0 and 1 only (partition
    // 0 non-empty on purpose: Spark always gives it a writer so the
    // schema survives an all-empty write — the one file LazyOutput
    // semantics can't suppress)
    val schema = StructType(Seq(StructField("n", IntegerType)))
    val rows = spark.sparkContext.parallelize(0 until 8, 8)
      .mapPartitionsWithIndex((i, it) => it.filter(_ => i < 2).map(Row(_)))
    val df = spark.createDataFrame(rows, schema)
    val out = java.nio.file.Files.createTempDirectory("lazyout").toString + "/t"
    df.write.parquet(out)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(files.length == 2,
      s"8 partitions, 2 non-empty: expected exactly 2 part files, got ${files.map(_.getName).toSeq}")
    assert(spark.read.parquet(out).count() == 2)
  }
}
