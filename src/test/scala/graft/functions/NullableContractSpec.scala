package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The nullable contract across graft's native expressions (the r17
  * PublicSuffix lesson): any expression that can return NULL from a
  * NON-NULL input must DECLARE `nullable = true` regardless of its
  * child — the inherited child nullability would let the parquet
  * writer treat the column as required and corrupt the file on the
  * first NULL row. Each case here writes the NULL-producing row
  * through a real parquet round-trip. */
class NullableContractSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  test("robots_crawl_delay: the no-directive row round-trips as NULL") {
    val dir = tmp("rcd-null")
    Seq("User-agent: *\nCrawl-delay: 3\n", "User-agent: *\nDisallow: /\n")
      .toDF("rules")
      .select(RobotsCrawlDelay(col("rules"), lit("bot")).as("delay"))
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).collect()
    assert(back.length == 2)
    assert(back.count(_.isNullAt(0)) == 1)
    assert(back.exists(r => !r.isNullAt(0) && r.getLong(0) == 3L))
  }

  test("registered_domain / public_suffix: suffix and invalid hosts round-trip as NULL") {
    val dir = tmp("psl-null2")
    Seq("a.example.co.uk", "co.uk", "192.168.0.1").toDF("h")
      .select(col("h"), RegisteredDomain(col("h")).as("d"),
        PublicSuffixOf(col("h")).as("s"))
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).orderBy("h").collect()
    assert(back.length == 3)
    // 192.168.0.1: both NULL; co.uk: domain NULL, suffix kept
    assert(back(0).isNullAt(1) && back(0).isNullAt(2))
    assert(back(2).isNullAt(1) && back(2).getString(2) == "co.uk")
    assert(back(1).getString(1) == "example.co.uk")
  }
}
