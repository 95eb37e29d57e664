package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** IVF (inverted-file) ANN index: a coarse quantizer — k centroids
  * learned by Lloyd iterations — partitions the corpus into posting
  * lists; a query probes only the `nProbe` nearest lists. The second
  * ANN scale path next to [[Similarity.lshTopK]] (hyperplane LSH):
  * IVF adapts to the data distribution where LSH is oblivious.
  *
  * Everything is DataFrame-native and deterministic: seeds are picked
  * by hash order (no RNG), each Lloyd iteration is one
  * broadcast-assign + one groupBy-mean (the classic iterative-MR shape
  * collapsed into two narrow/one wide stage per iteration), and only
  * k×dim doubles ever reach the driver. At 100 TB: k in the tens of
  * thousands, assignment is a map-only pass with the centroid table
  * broadcast, and search touches nProbe/k of the corpus.
  */
object Ivf {

  /** Assignment column: index (0-based) of the nearest centroid by
    * cosine; ties break to the lower index. */
  private def nearestCentroid(centroids: Seq[Array[Double]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val cCol = array(c.toIndexedSeq.map(lit): _*)
      struct(VectorFunctions.cosineFast(col("embedding"), cCol).as("s"),
        lit(-i).as("negi"))
    }
    -array_max(array(scored: _*)).getField("negi")
  }

  /** Learn `k` centroids with `iters` Lloyd iterations. Deterministic:
    * seeds are the first k vectors in `seedOrder` (default: xxhash64
    * of the id — a data-independent pseudo-shuffle; q119's oracle
    * passes plain `vec_id` order instead because DuckDB has no
    * xxhash64 to replay). */
  def buildCentroids(emb: DataFrame, k: Int, iters: Int,
                     seedOrder: Column = xxhash64(col("vec_id"))): Seq[Array[Double]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    var centroids: Seq[Array[Double]] = emb
      .orderBy(seedOrder)
      .limit(k)
      .select(VectorFunctions.toDoubleArray(col("embedding")))
      .as[Seq[Double]].collect().toSeq.map(_.toArray)
    // Per-iteration mean via the partial-merging vector-sum aggregate:
    // shuffles one (sum, count) partial per cluster per partition
    // (k×dim doubles), where a posexplode+groupBy formulation shuffled
    // N×dim scalar rows — the difference between O(k·dim·partitions)
    // and O(corpus·dim) bytes on the wire per Lloyd iteration.
    val dim = centroids.head.length
    val mean = VectorFunctions.vectorMean(dim)
    for (_ <- 0 until iters) {
      val means = emb.withColumn("cluster", nearestCentroid(centroids))
        .select(col("cluster"), VectorFunctions.toDoubleArray(col("embedding")).as("e"))
        .groupBy("cluster").agg(mean(col("e")).as("m"))
        .collect()
      val byCluster = means.filterNot(_.isNullAt(1))
        .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      centroids = centroids.indices.map { i =>
        // empty cluster keeps its centroid
        byCluster.get(i).map(_.toArray).getOrElse(centroids(i))
      }
    }
    centroids
  }

  /** Codebook trained by the engine-portable integer-exact Lloyd
    * driver ([[Clustering.lloyd]]) instead of the float cosine rounds
    * above: bit-deterministic across engines/JVMs (the lloydStep
    * replay contract), converges by exact integer fixed point.
    * Centroids come back ordered by cluster id in [[assign]]/[[topK]]
    * index form; a cluster left empty by the hash seeding (only
    * possible when the corpus is barely larger than k) keeps a zero
    * vector, which no query probes first. */
  def buildCentroidsLloyd(emb: DataFrame, k: Int, maxIter: Int,
                          dim: Int): Seq[Array[Double]] = {
    val r = Clustering.lloyd(emb, "vec_id", "embedding", k, maxIter, dim)
    r.release() // centroids-only consumer
    (0L until k.toLong).map(c => r.centroids.getOrElse(c, Array.fill(dim)(0.0)))
  }

  /** Corpus with its posting-list assignment (write once, reuse). */
  def assign(emb: DataFrame, centroids: Seq[Array[Double]]): DataFrame =
    emb.withColumn("cluster", nearestCentroid(centroids))

  /** ANN top-k: probe the `nProbe` clusters nearest each query vector,
    * rank candidates exactly. Output: (qid, vec_id, rank, sim). */
  def topK(emb: DataFrame, queryIds: Seq[Long], k: Int,
           centroids: Seq[Array[Double]], nProbe: Int): DataFrame = {
    val assigned = assign(emb, centroids)
    val probeScores = centroids.zipWithIndex.map { case (c, i) =>
      struct(VectorFunctions.cosineFast(col("qe"), array(c.toIndexedSeq.map(lit): _*)).as("s"),
        lit(i).as("i"))
    }
    val q = assigned.where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        slice(reverse(array_sort(array(probeScores: _*))), 1, nProbe).as("probes"))
      .select(col("qid"), col("qe"), explode(col("probes").getField("i")).as("cluster"))
    val cands = assigned.join(broadcast(q), Seq("cluster"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        VectorFunctions.cosineFast(col("qe"), col("embedding")).as("s"))
      .dropDuplicates("qid", "vec_id")
    val w = Window.partitionBy(col("qid")).orderBy(col("s").desc, col("vec_id"))
    cands.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("rank"), round(col("s"), 4).as("sim"))
      .orderBy(col("qid"), col("rank"))
  }
}
