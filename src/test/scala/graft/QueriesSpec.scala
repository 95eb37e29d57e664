package graft

/** Smoke-level contract checks over the whole declared surface: every
  * query runs at sf0.001, every oracle key has a query, the flagship
  * entry returns rows. (Value-level correctness is the DuckDB gate —
  * tools/local_verify.py at sf0.01.) */
class QueriesSpec extends SparkSpec {

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registerAll exposes every table to SQL, events with real timestamps") {
    graft.core.Tables.registerAll(spark, sf)
    assert(spark.sql("SELECT COUNT(*) FROM lineitem").head.getLong(0) > 0)
    val tsType = spark.sql("SELECT ts FROM events LIMIT 1").schema.head.dataType
    assert(tsType == org.apache.spark.sql.types.TimestampType, tsType)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001 and returns rows") {
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name produced no rows")
    }
  }

  test("scratch-backed round-trip queries rerun in one JVM") {
    // q45's saveAsSequenceFile and q61's HAR publish have no overwrite
    // mode — a rerun only works because scratch() wipes per invocation;
    // q58 must NOT be wiped (Derby keeps booted dbs registered by path)
    for (q <- Seq("q45_seqfile_roundtrip", "q61_har_roundtrip", "q58_jdbc_roundtrip")) {
      assert(SparkEntry.queries(q)(spark, sf).count() > 0, s"$q rerun failed")
    }
  }
}
