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
      val df = fn(spark, sf)
      // Decimal output policy (SCALE.md): DecimalType is welcome IN
      // the plan (exact money arithmetic) but never in a hashed output
      // column — cross-engine hashers render DECIMAL inconsistently
      // (q126, round 7). Emit integer units or ROUND'd doubles.
      val dec = df.schema.fields
        .filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType])
        .map(_.name)
      assert(dec.isEmpty,
        s"$name emits raw DecimalType column(s) ${dec.mkString(",")} — " +
          "emit integer units (x*10^s cast to long) instead")
      val n = df.count()
      assert(n > 0, s"$name produced no rows")
    }
  }

  test("q126 keeps exact DecimalType arithmetic internal to the plan") {
    val df = SparkEntry.queries("q126_decimal_money")(spark, sf)
    val plan = df.queryExecution.analyzed.toString
    // the capability under test: products and sums are decimal-exact
    assert(plan.contains("decimal("), s"no decimal arithmetic in plan:\n${plan.take(800)}")
    // ...but the emitted column is representation-stable integer units
    assert(df.schema("revenue_e4").dataType ==
      org.apache.spark.sql.types.LongType)
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
