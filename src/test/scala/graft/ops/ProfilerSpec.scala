package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Profiler.profile]] against directly-computed aggregates on
  * fixture and synthetic frames. */
class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("orders profile matches directly computed metrics, one row per column") {
    val o = graft.core.Tables.orders(spark, sf)
    val p = Profiler.profile(o).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == o.columns.toSet)
    val ck = p("o_custkey")
    assert(ck.getString(1) == "bigint")
    assert(ck.getLong(2) == 0) // no nulls
    assert(ck.getLong(3) == o.select(countDistinct(col("o_custkey")))
      .as[Long].head())
    assert(ck.getDouble(4) == o.agg(min(col("o_custkey"))).as[Long].head().toDouble)
    val st = p("o_orderstatus")
    assert(st.getString(6) == o.agg(min(col("o_orderstatus"))).as[String].head())
    assert(st.isNullAt(4) && st.isNullAt(5))
    // timestamp extrema come back as deterministic strings
    val dt = p("o_orderdate")
    assert(dt.getString(6).startsWith("19") || dt.getString(6).startsWith("20"))
  }

  test("nulls and complex types are handled") {
    val df = Seq(
      (1L, Some("a"), Seq(1, 2)),
      (2L, None, Seq.empty[Int]),
      (3L, Some("b"), Seq(3))).toDF("id", "s", "arr")
    val p = Profiler.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("s").getLong(2) == 1) // one null
    assert(p("s").getLong(3) == 2) // distinct non-null
    // complex column: counts present, extrema all null
    val arr = p("arr")
    assert(arr.getLong(2) == 0 && arr.getLong(3) == 3)
    assert(arr.isNullAt(4) && arr.isNullAt(6))
  }

  test("hostile column names fail loudly") {
    val df = Seq((1, 2)).toDF("ok", "bad'name")
    intercept[IllegalArgumentException] { Profiler.profile(df) }
  }

  test("q141 equals the generalized profiler on its four columns") {
    val o = graft.core.Tables.orders(spark, sf)
      .select("o_custkey", "o_totalprice", "o_orderstatus", "o_orderpriority")
    val gen = Profiler.profile(o)
      .select("col_name", "n_nulls", "n_distinct", "min_num", "max_num",
        "min_str", "max_str")
    val q141 = graft.SparkEntry.queries("q141_profile")(spark, sf)
    assert(gen.collect().toSeq == q141.collect().toSeq)
  }
}
