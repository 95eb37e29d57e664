package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions

class QuantizedSimSpec extends SparkSpec {
  lazy val emb = graft.core.Tables.embeddings(spark, sf)

  test("int8 cosine tracks exact cosine within rounding error") {
    val qz = emb.select(col("vec_id"),
      col("embedding").as("v"),
      VectorFunctions.quantizeInt8(col("embedding")).as("qv"))
    // deterministic reference vector (vec_id 0), not a partition-order
    // dependent limit(1)
    val a = qz.where(col("vec_id") === 0L).select(col("v").as("va"), col("qv").as("qa"))
    val pairs = qz.crossJoin(broadcast(a))
      .select(
        VectorFunctions.cosineFast(col("v"), col("va")).as("exact"),
        VectorFunctions.cosineInt8(col("qv"), col("qa")).as("approx"))
      .where(col("exact").isNotNull)
    assert(pairs.count() > 0, "no comparable pairs — is vec_id 0 a zero vector?")
    val maxErr = pairs.select(max(abs(col("exact") - col("approx")))).head.getDouble(0)
    assert(maxErr < 0.03, s"int8 cosine deviates by $maxErr")
  }

  test("quantized blob is 1 byte per element") {
    val r = emb.select(size(col("embedding")).as("dim"),
      length(VectorFunctions.quantizeInt8(col("embedding"))).as("blob")).head
    assert(r.getInt(0) == r.getInt(1))
  }

  test("quantized brute top-k keeps high recall vs the exact ranking") {
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val exact = Similarity.bruteTopK(emb, qids, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.bruteTopKQuantized(emb, qids, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall@10 over ${qids.size} queries: $recall")
  }
}
