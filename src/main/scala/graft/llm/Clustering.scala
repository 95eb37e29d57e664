package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One Lloyd (k-means) iteration over an embedding column, built so a
  * second engine can replay it bit-for-bit — the distributed-ML step a
  * training-data pipeline runs for cluster-balanced sampling or coarse
  * IVF codebook training ([[Ivf]] consumes exactly such centroids).
  *
  * Determinism strategy: embeddings quantize to integer grids
  * (round(e·scale)), centroids stay as EXACT integer (sum, count)
  * pairs — never a floating mean — and the squared distance
  *   ‖x‖² − 2(x·S)/n + ‖S‖²/n²
  * is evaluated from integer dot products in a fixed operation order,
  * so every divide/add is the same IEEE-754 double on any engine.
  * Ties broken by centroid id. No floating aggregation anywhere: the
  * only SUMs are over longs (order-free), the doubles appear in
  * per-row scalar expressions only.
  *
  * Scale posture: one shuffle (the d·k-cell centroid aggregate, map-
  * side combined); assignment is map-only against the BROADCAST k×d
  * centroid table — vectors never shuffle, and the k·d cells are
  * orders of magnitude below any data size. 100 TB of vectors is one
  * pass + a broadcast, per iteration.
  *
  * Reference capability twin: iterative cluster assignment jobs users
  * chained as MapReduce rounds (driver re-submitting with the previous
  * round's centroid file in the DistributedCache — the
  * hadoop-mapreduce-client-core DistributedCache.java:65 idiom);
  * here the "cache file" is a broadcast frame and the round is one
  * declarative plan.
  */
object Clustering {

  /** Integer-grid quantization of a float/double array column. */
  def quantize(vec: Column, scale: Int): Column =
    transform(vec, e => round(e.cast("double") * scale).cast("long"))

  private def dotL(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Run one assignment step: seed centroids from `labelCol` (the
    * previous iteration's assignment), return one row per vector with
    * the previous and the newly assigned centroid label.
    *
    * Output: (idCol, labelCol, assigned) — `assigned` is the id of
    * the nearest seed-centroid under the quantized metric. */
  def lloydStep(emb: DataFrame, idCol: String, vecCol: String,
                labelCol: String, dim: Int, scale: Int = 1000): DataFrame = {
    val guarded = when(size(col(vecCol)) === dim, col(vecCol))
      .otherwise(raise_error(concat(
        lit("lloydStep: embedding length "), size(col(vecCol)).cast("string"),
        lit(s" != expected dim $dim"))))
    val qv = emb.select(col(idCol), col(labelCol).cast("long").as("__old"),
      quantize(guarded, scale).as("__q"))

    // exact integer centroids: per-(label, position) sums — d·k cells,
    // map-side combined — plus per-label counts; rebuilt as an array
    // ordered by position so the dot product below is one fused pass
    val cells = qv.select(col("__old").as("__c"), posexplode(col("__q")))
      .groupBy("__c", "pos").agg(sum("col").as("s"))
    val cent = cells.groupBy("__c")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("s")))),
        p => p.getField("s")).as("__sv"))
    val counts = qv.groupBy(col("__old").as("__c")).agg(count(lit(1)).as("__n"))

    // fixed-order scalar double math over exact integer dots: identical
    // IEEE results on any engine, so argmin (tie → lowest centroid id)
    // is portable
    val nD = col("__n").cast("double")
    val dist = col("__xx").cast("double") -
      (lit(2.0) * dotL(col("__q"), col("__sv")).cast("double")) / nD +
      dotL(col("__sv"), col("__sv")).cast("double") / (nD * nD)
    val scored = qv.withColumn("__xx", dotL(col("__q"), col("__q")))
      .crossJoin(broadcast(cent))
      .join(broadcast(counts), "__c")
      .select(col(idCol), col("__old"), col("__c"), dist.as("__dist"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("__dist"), col("__c"))
    scored.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col(idCol), col("__old").as(labelCol), col("__c").as("assigned"))
  }
}
