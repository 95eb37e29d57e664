package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[PrefixSum.runningSum]] against the single-partition window
  * form on data small enough for the window to be trustworthy. */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("matches the window running sum across many partitions") {
    val df = (1L to 1000L).map(i => (i, (i % 7) - 3)).toDF("k", "v")
    val got = PrefixSum.runningSum(df, "k", "v", numPartitions = 8)
      .select("k", "running").as[(Long, Long)].collect().toMap
    val w = org.apache.spark.sql.expressions.Window.orderBy("k")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val exp = df.select(col("k"), sum("v").over(w).as("r"))
      .as[(Long, Long)].collect().toMap
    assert(got == exp)
  }

  test("duplicate order keys fail loudly") {
    val df = Seq((1L, 5L), (1L, 6L)).toDF("k", "v")
    val e = intercept[org.apache.spark.SparkException] {
      PrefixSum.runningSum(df, "k", "v", numPartitions = 2).collect()
    }
    assert(e.getMessage.contains("duplicate") || e.getCause != null)
  }

  test("empty partitions and negative values are fine") {
    val df = Seq((10L, -5L), (200L, 3L), (3000L, -1L)).toDF("k", "v")
    val got = PrefixSum.runningSum(df, "k", "v", numPartitions = 16)
      .select("k", "running").as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> -5L, 200L -> -2L, 3000L -> -3L))
  }
}
