package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Single-source BFS (shortest hop count) by iterative frontier
  * expansion — the other canonical iterative-joins workload next to
  * [[PageRank]] (the reference era ran these as chained MapReduce
  * rounds; see hadoop-mapreduce-examples' graph-adjacent jobs).
  *
  * Per round: ONE join (frontier × edges on `src`), a distinct, and
  * an anti-join against the visited set — all key-shuffles, nothing
  * collected. Lineage is cut per round with the same explicit-RDD
  * localCheckpoint discipline as [[PageRank]] / `Dedup.components`,
  * and the loop exits early when the frontier empties, so cost is
  * O(reached edges) per round with a naturally SHRINKING frontier
  * (unlike PageRank, where every node moves every round).
  *
  * 100 TB posture: visited state is O(reached nodes) rows shuffled by
  * key; `maxDepth` bounds the rounds; duplicate edges are absorbed by
  * the per-round distinct before they fan the next join.
  */
object Bfs {

  /** @param edges directed (srcCol, dstCol) edge list — pass both
    *              directions for an undirected graph
    * @return (node, dist) for every node within `maxDepth` hops,
    *         dist = minimal hop count from `source`
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          source: Long, maxDepth: Int): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= 30,
      s"bfs: maxDepth must be in [1, 30], got $maxDepth")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    e.count() // materialize the loop invariant once

    var visited = Seq((source, 0)).toDF("node", "dist")
    var frontier = visited
    var prevRdds: List[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]] = Nil
    var depth = 1
    var done = false
    while (depth <= maxDepth && !done) {
      val next = frontier.join(e, frontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited.select(col("node").as("vn")),
          col("node") === col("vn"), "left_anti")
        .select(col("node"), lit(depth).as("dist"))
      val nextRdd = next.rdd.localCheckpoint()
      val n = nextRdd.count() // eager cut before freeing prior rounds
      if (n == 0) { nextRdd.unpersist(); done = true }
      else {
        frontier = spark.createDataFrame(nextRdd, next.schema)
        val vis = visited.union(frontier)
        val visRdd = vis.rdd.localCheckpoint()
        visRdd.count()
        prevRdds.foreach(_.unpersist())
        prevRdds = List(nextRdd, visRdd)
        visited = spark.createDataFrame(visRdd, vis.schema)
        depth += 1
      }
    }
    e.unpersist()
    visited
  }
}
