package graft.ops

import graft.SparkSpec

/** Pins [[PageRank.run]] against an independent naive driver-side
  * power iteration on small deterministic graphs. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference: adjacency maps + sequential loop. */
  private def naive(edges: Seq[(Long, Long)], iters: Int,
                    damping: Double = 0.85): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outDeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size }
    var r = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val mass = edges
        .map { case (s, d) => d -> r(s) / outDeg(s) }
        .groupBy(_._1).map { case (d, ms) => d -> ms.map(_._2).sum }
      r = nodes.map(n => n -> ((1 - damping) + damping * mass.getOrElse(n, 0.0))).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] =
    PageRank.run(edges.toDF("s", "t"), "s", "t", iters)
      .as[(Long, Double)].collect().toMap

  test("symmetric cycle: every node keeps rank 1.0") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val got = run(edges, 5)
    assert(got.keySet == Set(1L, 2L, 3L))
    got.values.foreach(v => assert(math.abs(v - 1.0) < 1e-9, got.toString))
  }

  test("asymmetric graph matches the naive power iteration") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (4L, 3L), (3L, 1L))
    val exp = naive(edges, 4)
    val got = run(edges, 4)
    assert(got.keySet == exp.keySet)
    exp.foreach { case (n, v) =>
      assert(math.abs(got(n) - v) < 1e-9, s"node $n: got ${got(n)}, want $v")
    }
  }

  test("dangling node keeps base rank; sink accumulates; parallel edges add weight") {
    // 4 is dangling (in-edges only, via two PARALLEL edges from 1)
    val edges = Seq((1L, 4L), (1L, 4L), (1L, 2L), (2L, 4L))
    val exp = naive(edges, 3)
    val got = run(edges, 3)
    assert(got.keySet == exp.keySet)
    exp.foreach { case (n, v) =>
      assert(math.abs(got(n) - v) < 1e-9, s"node $n: got ${got(n)}, want $v")
    }
    // node 2 got 1/3 of node 1's mass each round; 4 is never a source
    assert(got(4L) > got(2L), got.toString)
  }

  test("iterations must be >= 1") {
    intercept[IllegalArgumentException] {
      PageRank.run(Seq((1L, 2L)).toDF("s", "t"), "s", "t", 0)
    }
  }
}
