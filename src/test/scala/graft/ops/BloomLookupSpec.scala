package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BloomMapFile analog (io/BloomMapFile.java:54): bloomWrite must
  * really persist parquet bloom filters, and the point lookup on the
  * bloom-keyed column must stay a pushed-down scan. */
class BloomLookupSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graftbloom").toString

  test("bloomWrite persists a bloom filter on the key column only") {
    val dir = tmpDir() + "/t"
    val df = (1 to 10000).map(i => (i.toLong, s"name_$i")).toDF("id", "name")
    Lookup.bloomWrite(df, dir, "id", ndv = 10000L)
    val cols = Lookup.bloomFilterColumns(spark, dir)
    assert(cols == Set("id"), cols)
  }

  test("lookup through the bloom-filtered table returns the row, pushed down") {
    val dir = tmpDir() + "/t"
    val df = (1 to 1000).map(i => (i.toLong, s"name_$i")).toDF("id", "name")
    Lookup.bloomWrite(df, dir, "id")
    val back = spark.read.parquet(dir)
    val hit = Lookup.pointLookup(back, col("id"), 7L)
    val p = hit.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(p.contains("PushedFilters: [IsNotNull(id), EqualTo(id,7)"), p)
    assert(hit.as[(Long, String)].collect().toSeq == Seq(7L -> "name_7"))
    // a guaranteed miss: bloom answers without data pages at scan time
    assert(Lookup.pointLookup(back, col("id"), -1L).count() == 0)
  }
}
