package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[DataJoin.taggedJoin]] against the reference datamerge
  * identities (…/mapreduce/lib/join/TestJoinDatamerge.java): sources
  * with duplicate keys, inner = cross-product only where every source
  * has the key, outer = any source, override/filter = combine's choice.
  * The fixture mirrors writeSimpleSrc's shape: `srcs` sources over a
  * shared key space, with per-source duplicate keys planted.
  */
class DataJoinSpec extends SparkSpec {
  import spark.implicits._

  private val srcs = 3
  // key k appears in source i with value 10*k+i; key k is planted as a
  // duplicate in source i when i == k % srcs (TestJoinDatamerge's
  // "add duplicate key" branch)
  private lazy val sources = (0 until srcs).map { i =>
    val rows = (0 until srcs * 2 + 1).flatMap { k =>
      val row = (k.toLong, 10 * k + i)
      if (k % srcs == i) Seq(row, row) else Seq(row)
    }
    (s"s$i", rows.toDF("k", "v"))
  }

  private lazy val tagged = {
    val dfs = sources.map { case (tag, df) =>
      df.select(col("k"), lit(tag).as("tag"), col("v"))
    }.reduce(_ unionByName _).as[(Long, String, Int)]
    dfs
  }

  test("inner combine equals the SQL 3-way inner join (multiplicities included)") {
    val n = srcs // local copy: the combine closure must not capture the suite
    val got = DataJoin.taggedJoin(tagged) { (k, tags, vs) =>
      if (tags.length == n) Some((k, vs(0), vs(1), vs(2))) else None
    }.toDF("k", "v0", "v1", "v2")
    val Seq((_, a), (_, b), (_, c)) = sources
    val want = a.select(col("k"), col("v").as("v0"))
      .join(b.select(col("k"), col("v").as("v1")), "k")
      .join(c.select(col("k"), col("v").as("v2")), "k")
    assert(got.count() == want.count())
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
  }

  test("outer combine emits every key from any source with tag visibility") {
    // every key exists in all 3 sources here, but the combine sees the
    // ACTUAL contributing tags — emit (key, n_tags) and check a key
    // planted in only one source
    val extra = Seq((100L, "s9", 1)).toDS()
    val got = DataJoin.taggedJoin(tagged union extra) { (k, tags, vs) =>
      Some((k, tags.length))
    }.toDF("k", "n").groupBy("k").agg(max("n").as("n"))
    assert(got.where(col("k") === 100L).head.getInt(1) == 1)
    assert(got.where(col("k") === 0L).head.getInt(1) == srcs)
  }

  test("combine returning None filters tuples (reference null path)") {
    val n = srcs // local copy: the combine closure must not capture the suite
    val got = DataJoin.taggedJoin(tagged) { (k, tags, vs) =>
      if (tags.length == n && k % 2 == 0) Some(k) else None
    }
    assert(got.collect().toSet == (0 until srcs * 2 + 1).filter(_ % 2 == 0).map(_.toLong).toSet)
  }

  test("maxValuesPerKey caps per-key memory and fan-out") {
    val hot = (0 until 500).map(i => (1L, s"s${i % 2}", i)).toDS()
    val capped = DataJoin.taggedJoin(hot, maxValuesPerKey = 10) { (k, tags, vs) =>
      Some(1)
    }
    // ≤10 surviving values split over 2 tags → cross product ≤ 25
    assert(capped.count() <= 25)
  }

  test("taggedLines + innerCombine reproduce a two-source line join") {
    val orders = graft.core.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").limit(50)
    val cust = graft.core.Tables.customer(spark, sf).select("c_custkey", "c_name")
    val tagged = DataJoin.taggedLines(Seq(
      ("O", orders.select(col("o_custkey").as("key"), col("o_orderkey"))),
      ("C", cust.select(col("c_custkey").as("key"), col("c_name")))), "key")
    val out = DataJoin.taggedJoin(tagged, maxValuesPerKey = Long.MaxValue)(
      DataJoin.innerCombine(2))
    val want = orders.join(cust, col("o_custkey") === col("c_custkey")).count()
    assert(out.count() == want)
    // line layout: key \t customer-line \t order-line (tags sorted: C < O)
    val first = out.head()
    assert(first.split("\t").length == 3)
  }
}
