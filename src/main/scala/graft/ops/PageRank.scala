package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative PageRank by join rounds — the canonical "big iterative
  * job" of the MapReduce era (the workload PageRank-on-Hadoop papers
  * and the reference's own tutorial examples gesture at), expressed
  * as Spark joins so Catalyst plans each round.
  *
  * Per round: ONE join (weighted edges × current ranks on `src`) and
  * ONE aggregation (mass per `dst`), i.e. two key-shuffles — the
  * minimum for a power iteration without materialized adjacency
  * partitioning. The weighted edge frame is computed once and
  * persisted (it is the loop invariant); per-round lineage is cut
  * with the same explicit-RDD localCheckpoint discipline as
  * [[graft.llm.Dedup.components]] so a 20-round run does not compound
  * its plan or leak one cached round per iteration.
  *
  * Dangling nodes (no out-edges) contribute no mass — the standard
  * simplification; callers who need stochastic-matrix exactness can
  * pre-add self-loops. With `iterations` fixed the result is
  * deterministic up to float summation order, which is why the
  * declared query (q118) rounds to 4 decimals and its oracle unrolls
  * the same number of rounds in SQL.
  *
  * 100 TB posture: state per round is O(nodes) ranks + O(edges)
  * contributions, all shuffled by key, never collected; the frontier
  * does not shrink (unlike components) because every node's rank
  * moves every round — cost is intrinsically iterations × (join +
  * agg).
  */
object PageRank {

  /** @param edges     (srcCol, dstCol) directed edge list; duplicates
    *                   are meaningful (parallel edges add weight)
    * @return (node, rank) for every node appearing as src or dst
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"pageRank: iterations must be >= 1, got $iterations")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    // loop invariants, computed once: per-edge weight 1/outdeg(src),
    // and the node universe (distinct src ∪ dst)
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
    val w = e.join(deg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("d")).as("wt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    nodes.count() // materialize both invariants before the loop
    val spark = edges.sparkSession

    var ranks = nodes.select(col("node"), lit(1.0).as("r"))
    var prevRdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = null
    for (_ <- 1 to iterations) {
      val contrib = w.join(ranks, w("src") === ranks("node"))
        .select(col("dst").as("node"), (col("r") * col("wt")).as("m"))
        .groupBy("node").agg(sum("m").as("m"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("m"), lit(0.0))).as("r"))
      val rdd = next.rdd.localCheckpoint()
      rdd.count() // eager cut: materialize before freeing the prior round
      if (prevRdd != null) prevRdd.unpersist()
      prevRdd = rdd
      ranks = spark.createDataFrame(rdd, next.schema)
    }
    w.unpersist()
    nodes.unpersist()
    ranks.select(col("node"), col("r").as("rank"))
  }
}
