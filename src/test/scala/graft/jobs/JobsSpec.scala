package graft.jobs

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JobsSpec extends SparkSpec {
  import spark.implicits._

  test("wordCount counts and orders tokens") {
    val df = Seq("a b a", "b a").toDF("t")
    val out = Jobs.wordCount(df, col("t")).as[(String, Long)].collect().toSeq
    assert(out == Seq(("a", 3L), ("b", 2L)))
  }

  test("grep counts every match occurrence") {
    val df = Seq("x sort y sort", "merge").toDF("t")
    val out = Jobs.grep(df, col("t"), "(sort|merge)").as[(String, Long)].collect().toSeq
    assert(out == Seq(("sort", 2L), ("merge", 1L)))
  }

  test("wordStats computes mean/median/stddev in one pass") {
    val df = Seq("ab abcd").toDF("t") // lengths 2 and 4
    val r = Jobs.wordStats(df, col("t")).head
    assert(r.getAs[Double]("mean_len") == 3.0)
    assert(r.getAs[Double]("median_len") == 3.0)
    assert(r.getAs[Double]("stddev_len") == 1.0)
    assert(r.getAs[Long]("n_words") == 2L)
  }

  test("piEstimate converges on the grid") {
    val pi = Jobs.piEstimate(spark, 500).head.getDouble(0)
    assert(math.abs(pi - math.Pi) < 0.01, s"pi estimate $pi")
  }
}

class CountersSpec extends SparkSpec {
  import graft.core.Counters

  test("observe counts records inside the plan") {
    val li = graft.core.Tables.lineitem(spark, sf)
    val (df, obs) = Counters.recordCount(li.where(col("l_quantity") > 45))
    val direct = df.count()
    assert(obs.get("count").asInstanceOf[Long] == direct)
  }
}

class SkipBadRecordsSpec extends SparkSpec {
  import graft.ops.SkipBadRecords
  import org.apache.spark.sql.Encoders

  test("bad records are skipped and counted, good ones survive") {
    import spark.implicits._
    val df = Seq("1", "2", "boom", "4").toDF("v")
    val (out, skipped) = SkipBadRecords.mapSkipBad(df, _.getString(0).toLong)(Encoders.scalaLong)
    assert(out.collect().sorted.toSeq == Seq(1L, 2L, 4L))
    assert(skipped.value == 1L)
  }
}

class OutputsSpec extends SparkSpec {
  import graft.ops.Outputs

  test("routedByColumn lays out one directory per key") {
    val tmp = java.nio.file.Files.createTempDirectory("routed").toString
    val ev = graft.core.Tables.events(spark, sf)
    Outputs.routedByColumn(ev, s"$tmp/out", "event_type")
    val dirs = new java.io.File(s"$tmp/out").listFiles()
      .filter(_.getName.startsWith("event_type=")).map(_.getName).sorted
    assert(dirs.nonEmpty)
    // reading back with a partition filter prunes to one directory
    val one = spark.read.parquet(s"$tmp/out")
      .where(org.apache.spark.sql.functions.col("event_type") === "error")
    assert(one.count() == ev.where(org.apache.spark.sql.functions.col("event_type") === "error").count())
  }

  test("sideOutputs writes each named projection") {
    val tmp = java.nio.file.Files.createTempDirectory("side").toString
    val ev = graft.core.Tables.events(spark, sf)
    Outputs.sideOutputs(ev, Map(
      "errors" -> (_.where(org.apache.spark.sql.functions.col("event_type") === "error")),
      "all_ids" -> (_.select("event_id"))), tmp)
    assert(spark.read.parquet(s"$tmp/errors").count() > 0)
    assert(spark.read.parquet(s"$tmp/all_ids").columns.toSeq == Seq("event_id"))
  }
}
