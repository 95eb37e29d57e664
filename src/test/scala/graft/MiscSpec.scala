package graft

import org.apache.spark.sql.functions._

class MultipleInputsSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.MultipleInputs

  test("heterogeneous sources align by name, missing columns null") {
    val a = Seq((1L, "x")).toDF("id", "name")
    val b = Seq((2L, 9.5)).toDF("id", "score")
    val out = MultipleInputs.union(Seq(
      (a, identity[org.apache.spark.sql.DataFrame] _),
      (b, (df: org.apache.spark.sql.DataFrame) => df.withColumn("name", lit("gen")))))
      .orderBy("id")
    assert(out.count() == 2)
    assert(out.columns.toSet == Set("id", "name", "score"))
    assert(out.where($"id" === 1L).head.isNullAt(out.columns.indexOf("score")))
  }
}

class GeneratorsSpec extends SparkSpec {
  import graft.jobs.Generators

  test("randomText is deterministic, sized, and skewed") {
    val a = Generators.randomText(spark, 200, 30, 4)
    val b = Generators.randomText(spark, 200, 30, 4)
    assert(a.except(b).count() == 0)
    val counts = graft.jobs.Jobs.wordCount(a, col("text"), lowercase = false)
      .collect().map(_.getLong(1))
    assert(counts.head > counts.last * 2, "expected skewed word distribution")
  }

  test("randomKV covers the key range deterministically") {
    val kv = Generators.randomKV(spark, 1000, keyRange = 100)
    assert(kv.count() == 1000)
    assert(kv.agg(max("key")).head.getLong(0) < 100)
    assert(kv.agg(min("key")).head.getLong(0) >= 0)
  }
}

class CosineNearDupSpec extends SparkSpec {
  import graft.llm.Similarity

  test("label-blocked near-dups never cross blocks and respect threshold") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val pairs = Similarity.cosineNearDups(emb, "label", 0.3)
    val labels = emb.select(col("vec_id"), col("label"))
    val crossed = pairs
      .join(labels.withColumnRenamed("vec_id", "id1").withColumnRenamed("label", "l1"), "id1")
      .join(labels.withColumnRenamed("vec_id", "id2").withColumnRenamed("label", "l2"), "id2")
      .where(col("l1") =!= col("l2")).count()
    assert(crossed == 0)
    assert(pairs.where(col("sim") < 0.3).count() == 0)
  }
}
