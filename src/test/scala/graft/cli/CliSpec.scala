package graft.cli

import graft.SparkSpec

/** CLI verb dispatch, driven through the same run path `main` uses
  * (session reuse instead of a fresh JVM per verb). */
class CliSpec extends SparkSpec {

  private def runVerb(args: String*): Unit = {
    val m = Main.getClass.getDeclaredMethod("run",
      classOf[org.apache.spark.sql.SparkSession], classOf[List[String]])
    m.setAccessible(true)
    m.invoke(Main, spark, args.toList)
  }

  test("wordcount verb writes parquet output") {
    val tmp = java.nio.file.Files.createTempDirectory("cli").toString
    runVerb("wordcount", s"$sf/documents.parquet", "text", s"$tmp/wc")
    val out = spark.read.parquet(s"$tmp/wc")
    assert(out.columns.toSeq == Seq("w", "c") && out.count() > 0)
  }

  test("grep verb writes match counts") {
    val tmp = java.nio.file.Files.createTempDirectory("cli").toString
    runVerb("grep", s"$sf/documents.parquet", "text", "spark", s"$tmp/g")
    assert(spark.read.parquet(s"$tmp/g").count() == 1)
  }

  test("dedup verb finds the planted near-duplicates") {
    val tmp = java.nio.file.Files.createTempDirectory("cli").toString
    runVerb("dedup", s"$sf/documents.parquet", "text", "doc_id", "0.5", s"$tmp/dd")
    assert(spark.read.parquet(s"$tmp/dd").count() > 0)
  }

  test("stream-window verb runs the streaming pipeline to completion") {
    val tmp = java.nio.file.Files.createTempDirectory("cli").toString
    graft.core.Tables.events(spark, sf).write.parquet(s"$tmp/in")
    runVerb("stream-window", s"$tmp/in", "user_id", "1 hour", s"$tmp/out")
    val out = spark.read.parquet(s"$tmp/out")
    assert(out.count() > 0)
    assert(out.columns.toSet == Set("user_id", "window_start", "n", "sv"))
  }

  test("copy verb round-trips a table") {
    val tmp = java.nio.file.Files.createTempDirectory("cli").toString
    runVerb("copy", s"$sf/nation.parquet", s"$tmp/nation")
    assert(spark.read.parquet(s"$tmp/nation").count() ==
      graft.core.Tables.nation(spark, sf).count())
  }
}
