package graft.agg

import graft.SparkSpec

class ValueAggregatorsSpec extends SparkSpec {
  import spark.implicits._

  lazy val df = Seq(
    ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 2L, 3.0),
    ("b", 5L, 10.0)).toDF("k", "x", "v")

  test("descriptor registry computes sum/min/max/count/uniq") {
    val out = ValueAggregators.aggregate(df, Seq("k"), Seq(
      "sum:x:sx", "min:x:mn", "max:x:mx", "count:x:c", "uniq:x:u"))
      .orderBy("k").collect()
    val a = out(0)
    assert(a.getAs[Long]("sx") == 5L && a.getAs[Long]("mn") == 1L &&
      a.getAs[Long]("mx") == 2L && a.getAs[Long]("c") == 3L && a.getAs[Long]("u") == 2L)
  }

  test("histogram descriptor yields full report struct") {
    val out = ValueAggregators.aggregate(df, Seq("k"), Seq("histogram:v:h"))
      .orderBy("k").collect()
    val h = out(0).getAs[org.apache.spark.sql.Row]("h")
    assert(h.getAs[Long]("count") == 3L)
    assert(h.getAs[Long]("distinct") == 3L)
    assert(h.getAs[Double]("mean") == 2.0)
    assert(h.getAs[Double]("min") == 1.0 && h.getAs[Double]("max") == 3.0)
  }

  test("default alias and capped-uniq variant") {
    val out = ValueAggregators.aggregate(df, Seq("k"), Seq("uniq~100:x"))
    assert(out.columns.contains("uniq_100_x"))
  }

  test("percentile descriptors: exact and sketched") {
    val dfv = (1 to 100).map(i => ("a", i.toDouble)).toDF("k", "v")
    val out = ValueAggregators.aggregate(dfv, Seq("k"),
      Seq("p50:v:med", "p95~:v:p95s")).head
    assert(out.getAs[Double]("med") == 50.5)
    assert(math.abs(out.getAs[Double]("p95s") - 95.0) <= 1.0)
  }

  test("sketched percentile tracks exact per-group quantiles on the corpus") {
    // the q87 scale claim: percentile_approx (mergeable t-digest, the
    // any-cardinality path) stays within tight tolerance of the exact
    // per-group percentile the oracle checks
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, graft.TestSpark.sf)
      .select(col("lang"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n_tok"))
    val both = docs.groupBy("lang").agg(
      expr("percentile(n_tok, 0.9)").as("exact"),
      percentile_approx(col("n_tok"), lit(0.9), lit(10000)).as("approx"))
    both.collect().foreach { r =>
      val (e, a) = (r.getAs[Double]("exact"), r.getAs[Long]("approx").toDouble)
      assert(math.abs(e - a) <= math.max(2.0, e * 0.05),
        s"lang ${r.getString(0)}: exact $e vs approx $a")
    }
  }

  test("perGroup top-k ranks within each group") {
    import org.apache.spark.sql.functions._
    val ev = graft.core.Tables.events(spark, graft.TestSpark.sf)
    val top = graft.ops.TopK.perGroup(ev, Seq("user_id"), 2,
      col("value").desc, col("event_id"))
    val sizes = top.groupBy("user_id").count()
    assert(sizes.where(col("count") > 2).count() == 0)
    // rank-1 row really is the group max
    val max1 = top.where(col("rank") === 1).select("user_id", "value")
    val trueMax = ev.groupBy("user_id").agg(max("value").as("value"))
    assert(max1.except(trueMax).count() == 0)
  }

  test("unknown descriptor fails fast") {
    intercept[IllegalArgumentException] {
      ValueAggregators.parse("bogus:v")
    }
  }

  test("uniq~ cap must be a positive integer") {
    intercept[NumberFormatException] { ValueAggregators.parse("uniq~abc:v") }
    intercept[IllegalArgumentException] { ValueAggregators.parse("uniq~0:v") }
  }
}
