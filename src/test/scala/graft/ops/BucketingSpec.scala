package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.SimpleMode

class BucketingSpec extends SparkSpec {

  test("bucketed-table join plans without a shuffle") {
    val orders = graft.core.Tables.orders(spark, sf)
    val lineitem = graft.core.Tables.lineitem(spark, sf)
    Bucketing.writeBucketed(orders, "b_orders", 4, "o_orderkey")
    Bucketing.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", 4, "o_orderkey")

    // disable auto-broadcast: at real scale neither side broadcasts,
    // and the point is the shuffle-free merge on bucket layout
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // and it is still correct
      assert(joined.count() == lineitem.count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucketed aggregation on the bucket key avoids the shuffle") {
    val agg = spark.table("b_lineitem").groupBy("o_orderkey").count()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }
}
