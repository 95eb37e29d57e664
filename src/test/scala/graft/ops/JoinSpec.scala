package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantics of the compose-join builders, mirroring the reference's
  * algebraic join tests (TestJoinDatamerge.java): controlled key
  * overlap across three sources, asserting membership rules for
  * inner / outer and rightmost-wins for override. */
class ComposeJoinSpec extends SparkSpec {
  import spark.implicits._

  // keys: a={1,2,3}, b={2,3,4}, c={3,4,5}
  private def src(name: String, keys: Seq[Int]) =
    keys.map(k => (k, s"$name$k")).toDF("k", s"v_$name")

  lazy val a = src("a", Seq(1, 2, 3))
  lazy val b = src("b", Seq(2, 3, 4))
  lazy val c = src("c", Seq(3, 4, 5))

  test("inner keeps keys present in all sources") {
    val out = ComposeJoin.inner("k", Seq(a, b, c))
    assert(out.select("k").as[Int].collect().sorted.toSeq == Seq(3))
  }

  test("outer keeps keys present in any source, nulls elsewhere") {
    val out = ComposeJoin.outer("k", Seq(a, b, c)).orderBy("k")
    assert(out.select("k").as[Int].collect().toSeq == Seq(1, 2, 3, 4, 5))
    val row1 = out.where($"k" === 1).head
    assert(row1.getAs[String]("v_a") == "a1" && row1.getAs[String]("v_b") == null)
  }

  test("override takes the rightmost source's value per key") {
    val s1 = Seq((1, "old1"), (2, "old2")).toDF("k", "v")
    val s2 = Seq((2, "new2"), (3, "new3")).toDF("k", "v")
    val out = ComposeJoin.overrideJoin("k", Seq(s1, s2)).orderBy("k")
      .as[(Int, String)].collect().toSeq
    assert(out == Seq((1, "old1"), (2, "new2"), (3, "new3")))
  }

  test("override: a null VALUE in the higher-priority source still wins") {
    val s1 = Seq((1, Some("old1")), (2, Some("old2"))).toDF("k", "v")
    val s2 = Seq((2, None: Option[String])).toDF("k", "v")
    val out = ComposeJoin.overrideJoin("k", Seq(s1, s2)).orderBy("k")
      .as[(Int, Option[String])].collect().toSeq
    assert(out == Seq((1, Some("old1")), (2, None)))
  }
}

class SecondarySortSpec extends SparkSpec {
  import org.apache.spark.sql.Encoders

  test("groups arrive whole, values in sort order") {
    val events = graft.core.Tables.events(spark, sf)
    implicit val enc = Encoders.product[(Long, Seq[Long])]
    val grouped = SecondarySort.groupedSorted[Long, (Long, Seq[Long])](
      events, "user_id", Seq(col("ts"), col("event_id")), 8)(
      _.getAs[Long]("user_id"),
      (k, rows) => Iterator.single((k, rows.map(_.getAs[Long]("event_id")).toSeq)))
    val result = grouped.collect().toMap
    // every user appears exactly once (no group split across partitions)
    assert(result.size == events.select("user_id").distinct().count())
    // per-group order matches the declarative window ordering
    val expected = events
      .select("user_id", "event_id", "ts")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
      .orderBy("user_id", "rn")
      .select("user_id", "event_id")
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    assert(result == expected)
  }
}

class PipeSpec extends SparkSpec {
  lazy val docs = graft.core.Tables.documents(spark, sf)

  test("pipeMap through cat is identity on lines") {
    val in = docs.select(col("text")).limit(50)
    val out = Pipe.pipeMap(in, Seq("cat"), Seq(col("text")))
    assert(out.count() == 50)
    assert(out.select(col("line")).except(in.select(col("text"))).count() == 0)
  }

  test("pipeMap serializes nulls as empty fields, keeping the layout stable") {
    import spark.implicits._
    val in = Seq((Some("a"), None: Option[String], Some("c"))).toDF("x", "y", "z")
    val out = Pipe.pipeMap(in, Seq("cat")).as[String].collect()
    assert(out.toSeq == Seq("a\t\tc"), s"layout shifted: ${out.toSeq}")
  }

  test("pipeMap through tr transforms content") {
    import spark.implicits._
    val in = Seq("hello").toDF("t")
    val out = Pipe.pipeMap(in, Seq("tr", "a-z", "A-Z"), Seq(col("t")))
    assert(out.as[String].collect().toSeq == Seq("HELLO"))
  }

  test("pipeReduce keeps key groups contiguous on the child's stdin") {
    import spark.implicits._
    // uniq -c collapses adjacent duplicates: if groups are contiguous,
    // each key appears exactly once in the output.
    val df = (1 to 100).flatMap(i => Seq.fill(5)(i % 10)).toDF("k")
    val out = Pipe.pipeReduce(df, Seq("uniq"), Seq("k"), numPartitions = 4)
    assert(out.count() == 10)
  }

  test("pipeMapJson round-trips a non-trivial schema through cat (typed-bytes stand-in)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // tab- and newline-hostile strings, nulls, nested array — the cases
    // the line idiom cannot carry
    val in = Seq(
      (1L, Some("tab\there"), Seq(1.5, 2.5), true),
      (2L, None: Option[String], Seq.empty[Double], false),
      (3L, Some("plain"), Seq(-0.25), true)
    ).toDF("id", "s", "xs", "flag")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("xs", ArrayType(DoubleType)), StructField("flag", BooleanType)))
    val out = Pipe.parseJson(Pipe.pipeMapJson(in, Seq("cat")), schema)
    assert(out.count() == 3)
    assert(out.except(in).count() == 0 && in.except(out).count() == 0)
    // the tab survived intact (the tab-joined idiom would have split it)
    assert(out.where(col("id") === 1L).select("s").head.getString(0) == "tab\there")
  }

  test("pipeMapJson lets a jq-less child filter JSON with grep") {
    import spark.implicits._
    val in = Seq((1, "keep"), (2, "drop"), (3, "keep")).toDF("id", "tag")
    // `|| true`: grep exits 1 on a partition with no matches, which
    // RDD.pipe would surface as a task failure
    val out = Pipe.pipeMapJson(in, Seq("sh", "-c", "grep keep || true"))
    assert(out.count() == 2)
  }

  test("parseKV splits on first separator only") {
    import spark.implicits._
    val lines = Seq("k1\tv1\tv2", "bare").toDF("line")
    val kv = Pipe.parseKV(lines).as[(String, String)].collect().toMap
    assert(kv("k1") == "v1\tv2")
    assert(kv("bare") == "")
  }
}
