package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PartitionersSpec extends SparkSpec {

  test("byKey co-locates equal keys") {
    val kv = graft.jobs.Generators.randomKV(spark, 10000, keyRange = 50)
    val pids = Partitioners.partitionIdOf(Partitioners.byKey(kv, 8, col("key")))
      .groupBy("key").agg(countDistinct("__pid").as("n"))
    assert(pids.where(col("n") =!= 1).count() == 0)
  }

  test("byBinaryRange co-locates keys sharing the byte range") {
    import spark.implicits._
    // keys share bytes 1-3 ("abc"), differ afterwards
    val df = Seq("abc-1", "abc-2", "abd-1", "abd-2")
      .toDF("s").select(col("s"), col("s").cast("binary").as("k"))
    val pids = Partitioners.partitionIdOf(
        Partitioners.byBinaryRange(df, 4, col("k"), 1, 3))
      .withColumn("prefix", substring(col("s"), 1, 3))
      .groupBy("prefix").agg(countDistinct("__pid").as("n"))
    assert(pids.where(col("n") =!= 1).count() == 0)
  }
}
