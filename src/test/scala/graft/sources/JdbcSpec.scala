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

  test("range-partitioned read of an empty table returns empty instead of NPE") {
    val empty = graft.core.Tables.nation(spark, sf).where("n_nationkey < 0")
    Jdbc.write(empty, url, "empty_t", SaveMode.Overwrite)
    // MIN/MAX are NULL here — the reader must fall back to a plain read
    val back = Jdbc.readPartitioned(spark, url, "empty_t", "n_nationkey", 4)
    assert(back.count() == 0)
  }
}
