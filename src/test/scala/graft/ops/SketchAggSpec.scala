package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the Datasketches HLL surface (Spark 4 `hll_sketch_agg` /
  * `hll_union_agg` / `hll_sketch_estimate`): accuracy against the
  * exact distinct count, and the mergeability contract — sharded
  * sketches unioned == the whole-corpus sketch, byte-for-byte
  * estimate. Mergeability is what makes the sketch the 100 TB path:
  * per-partition sketches shuffle as ~KB blobs (map-side combined)
  * where an exact distinct shuffles every value. Estimates are
  * deterministic for a given input set but implementation-specific,
  * so this is a tolerance/invariant spec, not a DuckDB oracle row. */
class SketchAggSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val toks = docs
    .select(explode(split(lower(col("text")), " ")).as("tok"))
    .where(col("tok") =!= "")

  test("hll estimate within 3% of the exact distinct token count") {
    val exact = toks.select(countDistinct(col("tok"))).as[Long].head()
    val est = toks.select(hll_sketch_estimate(hll_sketch_agg(col("tok"))))
      .as[Long].head()
    assert(math.abs(est - exact).toDouble / exact <= 0.03, s"est=$est exact=$exact")
  }

  test("sharded sketches union to the same estimate as one pass") {
    val whole = toks.select(hll_sketch_estimate(hll_sketch_agg(col("tok"))))
      .as[Long].head()
    val sharded = toks
      .withColumn("shard", pmod(hash(col("tok")), lit(7)))
      .groupBy("shard").agg(hll_sketch_agg(col("tok")).as("sk"))
      .select(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .as[Long].head()
    assert(sharded == whole, s"sharded=$sharded whole=$whole")
  }

  test("incremental: a persisted sketch unions with a new batch — history never re-read") {
    // the q88 incremental-dedup pattern applied to distinct counting:
    // sketch history once to a (binary) parquet column, union new
    // batches against it; estimate == the one-shot whole-corpus pass
    val dir = java.nio.file.Files.createTempDirectory("hll-idx").toString
    val history = toks.where(pmod(hash(col("tok")), lit(2)) === 0)
    val fresh = toks.where(pmod(hash(col("tok")), lit(2)) === 1)
    history.agg(hll_sketch_agg(col("tok")).as("sk"))
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val est = stored
      .unionAll(fresh.agg(hll_sketch_agg(col("tok")).as("sk")))
      .select(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .as[Long].head()
    val whole = toks.select(hll_sketch_estimate(hll_sketch_agg(col("tok"))))
      .as[Long].head()
    assert(est == whole, s"incremental=$est whole=$whole")
  }

  test("estimates are deterministic for the same input set") {
    val a = toks.repartition(3)
      .select(hll_sketch_estimate(hll_sketch_agg(col("tok")))).as[Long].head()
    val b = toks.repartition(11)
      .select(hll_sketch_estimate(hll_sketch_agg(col("tok")))).as[Long].head()
    assert(a == b, s"$a vs $b")
  }

  // q231's log2-binned quantile sketch: shard histograms merged by
  // count addition must reproduce the whole-corpus histogram exactly
  // (integer bins — no ulp), and hence identical quantile bounds.
  // That additivity is the sketch's 100 TB contract: per-shard state
  // is <=64 integer cells per group regardless of rows.
  test("log2Bin is loud on non-positive AND null input instead of emitting garbage bins") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception] {
      Seq(4L, 0L).toDF("x")
        .select(QuantileSketch.log2Bin(col("x"))).collect()
    }
    assert(msgs(e).exists(_.contains("non-positive or null value")), msgs(e).toString)
    // a NULL previously flowed through as a null bin that sorted first
    // in the cumulative window yet counted in n, silently deflating
    // every quantile bound (ADVICE r9) — now it raises like 0 does
    val eNull = intercept[Exception] {
      Seq(Some(4L), None).toDF("x")
        .select(QuantileSketch.log2Bin(col("x"))).collect()
    }
    assert(msgs(eNull).exists(_.contains("non-positive or null value")),
      msgs(eNull).toString)
    // positives bin exactly: floor(log2)
    val ok = Seq(1L, 2L, 3L, 4L, 1023L, 1024L).toDF("x")
      .select(QuantileSketch.log2Bin(col("x")).as("b"))
      .as[Long].collect().toSeq
    assert(ok == Seq(0L, 1L, 1L, 2L, 9L, 10L))
  }

  test("log2-binned quantile histogram merges exactly across shards") {
    val ev = graft.core.Tables.events(spark, sf)
    def hist(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_type"), (length(bin(
        expr("GREATEST(CAST(ROUND(value * 100) AS BIGINT), 1)"))) - 1)
        .cast("long").as("b"))
      .groupBy("event_type", "b").agg(count(lit(1)).as("c"))
    val whole = hist(ev)
    val merged = (0 until 3)
      .map(i => hist(ev.where(pmod(col("event_id"), lit(3)) === i)))
      .reduce(_ unionByName _)
      .groupBy("event_type", "b").agg(sum("c").as("c"))
    val wRows = whole.as[(String, Long, Long)].collect().toSet
    val mRows = merged.as[(String, Long, Long)].collect().toSet
    assert(wRows == mRows, s"merged shard histogram diverged:\n$wRows\nvs\n$mRows")
  }
}
