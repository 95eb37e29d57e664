package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = graft.core.Tables.embeddings(spark, sf)
  lazy val centroids = Ivf.buildCentroids(emb, 8, 2)

  test("centroids are deterministic and dimensioned") {
    val again = Ivf.buildCentroids(emb, 8, 2)
    assert(centroids.length == 8)
    assert(centroids.forall(_.length == 64))
    assert(centroids.zip(again).forall { case (a, b) => a.sameElements(b) })
  }

  test("assignment covers the corpus with valid cluster ids") {
    val assigned = Ivf.assign(emb, centroids)
    assert(assigned.count() == emb.count())
    assert(assigned.where(col("cluster") < 0 || col("cluster") >= 8).count() == 0)
    // more than one cluster actually in use
    assert(assigned.select("cluster").distinct().count() > 1)
  }

  test("ivf top-k achieves useful recall vs brute force, probing a corpus fraction") {
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val brute = Similarity.bruteTopK(emb, qids, 5)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Ivf.topK(emb, qids, 5, centroids, 3)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = brute.count(ivf.contains).toDouble / brute.size
    assert(recall >= 0.3, s"ivf recall $recall")
  }
}
