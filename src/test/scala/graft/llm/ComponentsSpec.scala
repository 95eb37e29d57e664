package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Connected-component resolution of near-dup pairs into groups. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def comps(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.components(pairs.toDF("id1", "id2"))
      .as[(Long, Long)].collect().toMap

  test("disjoint pairs form separate groups labeled by their min id") {
    assert(comps(Seq(1L -> 2L, 3L -> 4L)) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("transitive pairs merge into one group (a-b, b-c, c-d)") {
    assert(comps(Seq(2L -> 7L, 7L -> 5L, 5L -> 9L)) ==
      Map(2L -> 2L, 7L -> 2L, 5L -> 2L, 9L -> 2L))
  }

  test("a chain longer than one hop converges (diameter > 2)") {
    val chain = (0L until 12L).map(i => i -> (i + 1))
    val got = comps(chain)
    assert(got.size == 13 && got.values.forall(_ == 0L), got)
  }

  test("a star around a high id picks the smallest leaf as canonical") {
    assert(comps(Seq(100L -> 3L, 100L -> 8L, 100L -> 5L)) ==
      Map(100L -> 3L, 3L -> 3L, 8L -> 3L, 5L -> 3L))
  }

  test("pair order and direction do not matter") {
    val a = comps(Seq(4L -> 1L, 2L -> 4L))
    val b = comps(Seq(1L -> 4L, 4L -> 2L))
    assert(a == b && a == Map(1L -> 1L, 4L -> 1L, 2L -> 1L))
  }

  test("string ids survive (no silent numeric cast) and pick the lexicographic min") {
    val got = Dedup.components(
        Seq("docB" -> "docA", "docB" -> "docC").toDF("id1", "id2"))
      .as[(String, String)].collect().toMap
    assert(got == Map("docA" -> "docA", "docB" -> "docA", "docC" -> "docA"), got)
  }

  test("random graphs match a brute-force union-find (fixed seeds)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val n = 30
      val pairs = Seq.fill(25)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // reference: union-find with path compression
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        .map(v => v -> find(v)).toMap
      // find() roots at the min only along union order; normalize to
      // component-min to match components()' contract
      val byRoot = want.groupBy(_._2).flatMap { case (_, m) =>
        val mn = m.keys.min; m.keys.map(_ -> mn)
      }
      assert(comps(pairs) == byRoot, s"seed=$seed")
    }
  }

  test("non-convergence within maxIter throws instead of returning wrong groups") {
    val chain = (0L until 40L).map(i => i -> (i + 1))
    intercept[IllegalStateException] {
      Dedup.components(chain.toDF("id1", "id2"), maxIter = 2).collect()
    }
  }

  test("incrementalComponents folded over batches equals one-shot components (random splits)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(100 + seed)
      val n = 30
      val pairs = Seq.fill(30)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val nBatches = 2 + rnd.nextInt(3)
      val batches = pairs.grouped((pairs.size + nBatches - 1) / nBatches).toSeq
      // seed assignment: batch 0 one-shot; fold the rest incrementally
      var assign = Dedup.components(batches.head.toDF("id1", "id2"))
      batches.tail.foreach { b =>
        assign = Dedup.incrementalComponents(assign, b.toDF("id1", "id2"))
      }
      val inc = assign.as[(Long, Long)].collect().toMap
      val full = Dedup.components(pairs.toDF("id1", "id2"))
        .as[(Long, Long)].collect().toMap
      assert(inc == full, s"seed=$seed batches=${batches.map(_.size)}")
      spark.catalog.clearCache()
    }
  }

  test("incrementalComponents bridges two existing groups and keeps singletons") {
    // existing: {1,2} (comp 1), {10,11} (comp 10), singleton 99
    val assign = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L), (99L, 99L))
      .toDF("id", "comp_id")
    // the new pair bridges the two groups through their members
    val out = Dedup.incrementalComponents(assign, Seq((2L, 11L)).toDF("id1", "id2"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L, 99L -> 99L), out)
  }

  private def starComps(pairs: Seq[(Long, Long)], maxIter: Int = 50): Map[Long, Long] =
    Dedup.componentsStar(pairs.toDF("id1", "id2"), maxIter = maxIter)
      .as[(Long, Long)].collect().toMap

  test("componentsStar agrees with components on random graphs") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 4) {
      val pairs = Seq.fill(40)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter(p => p._1 != p._2)
      assert(starComps(pairs) == comps(pairs))
    }
  }

  test("componentsStar resolves a 64-chain in far fewer than diameter rounds") {
    // diameter 64: label propagation needs ~64 rounds; the star
    // alternation must land inside a 10-round budget (O(log^2 n))
    val chain = (0L until 64L).map(i => i -> (i + 1))
    val got = starComps(chain, maxIter = 10)
    assert(got.size == 65 && got.values.forall(_ == 0L), got.toString)
  }

  test("componentsStar keeps self-loop-only nodes as singleton components") {
    // (7,7) must not vanish: same contract as components()
    val pairs = Seq(1L -> 2L, 7L -> 7L)
    assert(starComps(pairs) == Map(1L -> 1L, 2L -> 1L, 7L -> 7L))
    assert(comps(pairs) == starComps(pairs))
  }

  test("componentsStar labels every node, minima included, exactly once") {
    val got = Dedup.componentsStar(
      Seq(5L -> 9L, 9L -> 2L, 11L -> 30L).toDF("id1", "id2"))
      .as[(Long, Long)].collect()
    assert(got.length == got.map(_._1).distinct.length, "duplicate id rows")
    assert(got.toMap == Map(2L -> 2L, 5L -> 2L, 9L -> 2L, 11L -> 11L, 30L -> 11L))
  }
}
