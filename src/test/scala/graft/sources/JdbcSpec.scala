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

  test("range-partitioned read of an empty table returns empty instead of NPE") {
    val empty = graft.core.Tables.nation(spark, sf).where("n_nationkey < 0")
    Jdbc.write(empty, url, "empty_t", SaveMode.Overwrite)
    // MIN/MAX are NULL here — the reader must fall back to a plain read
    val back = Jdbc.readPartitioned(spark, url, "empty_t", "n_nationkey", 4)
    assert(back.count() == 0)
  }
}
