package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.SaveMode

/** End-to-end JDBC round trip against embedded Derby (on the Spark
  * classpath) — the DBOutputFormat → DBInputFormat cycle, including
  * the range-partitioned parallel read. */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("write then read back, single partition") {
    val nation = graft.core.Tables.nation(spark, sf)
    Jdbc.write(nation, url, "nation", SaveMode.Overwrite)
    val back = Jdbc.read(spark, url, "nation")
    assert(back.count() == nation.count())
    assert(back.columns.map(_.toLowerCase).toSet == nation.columns.toSet)
  }

  test("range-partitioned read splits the table") {
    val customer = graft.core.Tables.customer(spark, sf)
    Jdbc.write(customer, url, "customer", SaveMode.Overwrite)
    val back = Jdbc.readPartitioned(spark, url, "customer", "c_custkey", 4)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == customer.count())
  }

  test("DBCountPageView shape: DB scan -> aggregate -> DB sink round trip") {
    // the reference example (EX/DBCountPageView.java): read an access
    // log from a database, count views per url, write the counts back
    import spark.implicits._
    val log = Seq(("/a", "u1"), ("/a", "u2"), ("/b", "u1"), ("/a", "u1"))
      .toDF("url", "visitor")
    Jdbc.write(log, url, "access_log", SaveMode.Overwrite)
    val counts = Jdbc.read(spark, url, "access_log")
      .groupBy("url").count()
    Jdbc.write(counts, url, "pageview_counts", SaveMode.Overwrite)
    val back = Jdbc.read(spark, url, "pageview_counts")
      .as[(String, Long)].collect().toMap
    assert(back == Map("/a" -> 3L, "/b" -> 1L), back)
  }

  test("text-column split read: >1 real partition, no row lost or doubled") {
    import org.apache.spark.sql.functions.col
    val customer = graft.core.Tables.customer(spark, sf)
      .select("c_custkey", "c_name")
    // the scenario is a VARCHAR key — Spark's default string mapping is
    // CLOB on Derby, which supports neither MIN/MAX nor comparisons
    val wprops = new java.util.Properties
    wprops.setProperty("createTableColumnTypes", "c_name VARCHAR(32)")
    Jdbc.write(customer, url, "cust_text", SaveMode.Overwrite, wprops)
    val back = Jdbc.readPartitionedText(spark, url, "cust_text", "c_name", 4)
    // the split-read plans one partition per predicate…
    assert(back.rdd.getNumPartitions > 1, back.rdd.getNumPartitions)
    // …and more than one of them actually carries rows (the cuts fall
    // inside the Customer#... key range, not off one end)
    val perPart = back.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(perPart.count(_ > 0) > 1, perPart.toSeq)
    // exact multiset equality with the source
    val src = customer.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val got = back.select(col("c_custkey").cast("long"), col("c_name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got == src)
  }

  test("text splitter cuts are ordered, interior, and handle edge inputs") {
    // uniform ASCII range: expect the full cut count, strictly inside
    val cuts = Jdbc.textCuts("aaaa", "zzzz", 4)
    assert(cuts.size == 3 && cuts == cuts.sorted && cuts.distinct == cuts)
    assert(cuts.forall(c => c > "aaaa" && c < "zzzz"))
    // common prefix: cuts must carry the prefix
    val pref = Jdbc.textCuts("Customer#000000001", "Customer#000001500", 4)
    assert(pref.nonEmpty && pref.forall(_.startsWith("Customer#")))
    // degenerate interval: no cuts rather than bogus ones
    assert(Jdbc.textCuts("same", "same", 4).isEmpty)
    assert(Jdbc.textCuts("b", "a", 4).isEmpty)
    // quotes in bounds must not break the SQL literals downstream
    val q = Jdbc.textCuts("O'a", "O'z", 3)
    assert(q.forall(c => c > "O'a" && c < "O'z"))
  }

  test("range-partitioned read of an empty table returns empty instead of NPE") {
    val empty = graft.core.Tables.nation(spark, sf).where("n_nationkey < 0")
    Jdbc.write(empty, url, "empty_t", SaveMode.Overwrite)
    // MIN/MAX are NULL here — the reader must fall back to a plain read
    val back = Jdbc.readPartitioned(spark, url, "empty_t", "n_nationkey", 4)
    assert(back.count() == 0)
  }
}
