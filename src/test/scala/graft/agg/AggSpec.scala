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

  test("unknown descriptor fails fast") {
    intercept[IllegalArgumentException] {
      ValueAggregators.parse("bogus:v")
    }
  }
}
