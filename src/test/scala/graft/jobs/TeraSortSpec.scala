package graft.jobs

import graft.SparkSpec

class TeraSortSpec extends SparkSpec {

  test("gen is deterministic and sized correctly") {
    val a = TeraSort.gen(spark, 1000, 4).collect()
    val b = TeraSort.gen(spark, 1000, 4).collect()
    assert(a.length == 1000)
    assert(a.map(_.getString(0)).toSet == b.map(_.getString(0)).toSet)
    assert(a.forall(r => r.getString(0).length == 10 && r.getString(1).length == 90))
  }

  test("sort → validate proves global order and checksum preservation") {
    val rows = 50000L
    val input = TeraSort.gen(spark, rows, 8)
    val checksum = TeraSort.checksumOf(input)
    val (n, c) = TeraSort.validate(TeraSort.sort(TeraSort.gen(spark, rows, 8)), checksum, rows)
    assert(n == rows && c == checksum)
  }

  test("validate rejects truncated output") {
    val rows = 10000L
    val input = TeraSort.gen(spark, rows, 4)
    val checksum = TeraSort.checksumOf(input)
    val truncated = TeraSort.sort(TeraSort.gen(spark, rows, 4)).limit(5000)
    intercept[IllegalArgumentException] {
      TeraSort.validate(truncated, checksum, rows)
    }
  }

  test("validate rejects corrupted content") {
    import org.apache.spark.sql.functions._
    val rows = 10000L
    val input = TeraSort.gen(spark, rows, 4)
    val checksum = TeraSort.checksumOf(input)
    val corrupted = TeraSort.sort(
      TeraSort.gen(spark, rows, 4)
        .withColumn("value", concat(col("value"), lit("x"))))
    intercept[IllegalArgumentException] {
      TeraSort.validate(corrupted, checksum, rows)
    }
  }
}
