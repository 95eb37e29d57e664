package graft.ops

import graft.SparkSpec

/** Pins [[Bfs.run]] against an independent naive driver-side BFS on
  * small deterministic graphs. */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference: queue-based BFS over an adjacency map. */
  private def naive(edges: Seq[(Long, Long)], source: Long,
                    maxDepth: Int): Map[Long, Int] = {
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    var dist = Map(source -> 0)
    var frontier = Seq(source)
    for (d <- 1 to maxDepth) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .distinct.filterNot(dist.contains)
      dist ++= frontier.map(_ -> d)
    }
    dist
  }

  private def run(edges: Seq[(Long, Long)], source: Long,
                  maxDepth: Int): Map[Long, Int] =
    Bfs.run(edges.toDF("s", "t"), "s", "t", source, maxDepth)
      .as[(Long, Int)].collect().toMap

  test("chain graph: dist equals position, truncated at maxDepth") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(run(edges, 0L, 3) == Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3))
  }

  test("diamond with a long detour: shortest path wins") {
    // 0→1→3 (len 2) vs 0→2→4→3 (len 3): 3 must report dist 2
    val edges = Seq((0L, 1L), (1L, 3L), (0L, 2L), (2L, 4L), (4L, 3L))
    val got = run(edges, 0L, 5)
    assert(got == naive(edges, 0L, 5))
    assert(got(3L) == 2)
  }

  test("cycle terminates via early exit; unreachable nodes absent") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (7L, 8L))
    val got = run(edges, 1L, 10)
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("parallel and duplicate edges do not inflate the frontier") {
    val edges = Seq((0L, 1L), (0L, 1L), (1L, 2L), (1L, 2L), (1L, 2L))
    val got = run(edges, 0L, 4)
    assert(got == Map(0L -> 0, 1L -> 1, 2L -> 2))
  }

  test("maxDepth validation is loud") {
    intercept[IllegalArgumentException] {
      Bfs.run(Seq((1L, 2L)).toDF("s", "t"), "s", "t", 1L, 0)
    }
    intercept[IllegalArgumentException] {
      Bfs.run(Seq((1L, 2L)).toDF("s", "t"), "s", "t", 1L, 31)
    }
  }

  test("matches naive on a random-ish fixed graph") {
    val edges = Seq(
      (0L, 1L), (0L, 2L), (1L, 4L), (2L, 4L), (4L, 5L), (5L, 6L),
      (6L, 0L), (3L, 6L), (4L, 3L), (2L, 7L), (7L, 8L), (8L, 9L))
    for (depth <- Seq(1, 2, 3, 6))
      assert(run(edges, 0L, depth) == naive(edges, 0L, depth), s"depth=$depth")
  }
}
