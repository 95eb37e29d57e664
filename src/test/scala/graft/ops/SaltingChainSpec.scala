package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed: 90% of rows share key 0
  lazy val skewed = spark.range(10000).select(
    when(col("id") % 10 =!= 0, 0L).otherwise(col("id")).as("k"),
    col("id").as("v"))
  lazy val dim = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("w"))

  test("saltedJoin equals the plain join") {
    val plain = skewed.join(dim, "k").select("k", "v", "w")
    val salted = Salting.saltedJoin(skewed, dim, "k", 8).select("k", "v", "w")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
  }

  test("saltedJoin spreads the hot key over multiple salts") {
    val salts = skewed.withColumn("s", Salting.salt(8, skewed.columns.map(col): _*))
      .where(col("k") === 0).select("s").distinct().count()
    assert(salts > 4, s"hot key only hit $salts salt buckets")
  }

  test("bitwise-identical duplicate rows under a hot key still fan out") {
    // the classic skew shape: one key, duplicated records. A salt
    // derived from row content alone maps all of these to ONE bucket —
    // the positional component must spread them anyway.
    val dupes = spark.range(10000).select(lit(0L).as("k"), lit(7L).as("v"))
    val buckets = dupes.withColumn("s", Salting.salt(8)).select("s").distinct().count()
    assert(buckets > 4, s"duplicate rows hit only $buckets salt buckets")
    // and the salted join over them still equals the plain join
    val plain = dupes.join(dim, "k").count()
    assert(Salting.saltedJoin(dupes, dim, "k", 8).count() == plain)
  }

  test("saltedAgg equals the plain aggregation") {
    val plain = skewed.groupBy("k").agg(sum("v").as("sv"))
    val salted = Salting.saltedAgg(skewed, "k", 8, sum(col("v")), "sv", c => sum(col(c)))
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
  }
}

class ChainSpec extends SparkSpec {
  import spark.implicits._

  test("chained links collapse into one plan and compose in order") {
    val df = spark.range(1, 6).select(col("id").cast("int").as("x"))
    val out = Chain(df)(
      _.withColumn("y", col("x") * 2),
      _.where(col("y") > 4),
      _.withColumn("z", col("y") + 1))
    assert(out.select("z").as[Int].collect().sorted.toSeq == Seq(7, 9, 11))
    // adjacent projections/filters merge: every operator carries the
    // same whole-stage-codegen id (`*(1)`) — one fused stage, no
    // materialization between links
    val plan = out.queryExecution.executedPlan.toString
    val stageIds = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan).map(_.group(1)).toSet
    assert(stageIds == Set("1"), plan)
  }
}

/** SortValidator-style shuffle invariants (reference test strategy
  * §5.3: RecordStatsChecker proves count/checksum preservation across
  * the shuffle): whatever partitioning the data takes, content-derived
  * totals are unchanged. */
class ShuffleInvariantSpec extends SparkSpec {

  lazy val kv = graft.jobs.Generators.randomKV(spark, 100000, keyRange = 5000)
  // order-insensitive bounded checksum: sum of (hash mod p) never
  // overflows a long under ANSI mode (1e5 rows × 1e9 < 2^63)
  private def rowHash = pmod(xxhash64(col("key"), col("value")), lit(1000000007L))

  test("count, sum, and checksum survive repartition + groupBy") {
    val direct = kv.agg(
      count(lit(1)).as("n"), sum("value").as("s"), sum(rowHash).as("h")).head
    val shuffled = kv.repartition(17, col("key"))
      .groupBy("key").agg(count(lit(1)).as("n"), sum("value").as("s"),
        sum(rowHash).as("h"))
      .agg(sum("n").as("n"), sum("s").as("s"), sum("h").as("h")).head
    assert(direct.getLong(0) == shuffled.getLong(0))
    assert(direct.getLong(1) == shuffled.getLong(1))
    assert(direct.getLong(2) == shuffled.getLong(2))
  }

  test("total-order sort preserves content (count + checksum) and orders globally") {
    val sorted = kv.orderBy("key", "value")
    assert(sorted.count() == kv.count())
    val h1 = kv.agg(sum(rowHash)).head.getLong(0)
    val h2 = sorted.agg(sum(rowHash)).head.getLong(0)
    assert(h1 == h2)
    val keys = sorted.select("key").collect().map(_.getLong(0))
    assert(keys.zip(keys.tail).forall { case (a, b) => a <= b })
  }
}
