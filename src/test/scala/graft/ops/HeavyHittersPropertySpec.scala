package graft.ops

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import scala.collection.mutable

/** Property-pins the Misra-Gries invariant [[HeavyHitters]] relies
  * on: for ANY key stream, ANY partitioning of it, and ANY summary
  * size k, every key with true count > n/k survives the per-partition
  * summaries and their pairwise merge. (The exact second pass then
  * only ever REMOVES false candidates, so end-to-end exactness
  * follows from this property alone.) Driver-side, no Spark jobs —
  * 200 deterministic cases. */
class HeavyHittersPropertySpec extends SparkSpec {

  private def cases[A](gen: Gen[A], n: Int = 200)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(77L + i)).foreach(check)
    }

  private val caseGen = for {
    // skewed alphabet: two hot keys + a light tail
    keys <- Gen.listOfN(400, Gen.frequency(
      8 -> Gen.const("hot1"), 4 -> Gen.const("hot2"),
      3 -> Gen.choose(0, 50).map("t" + _)))
    k <- Gen.choose(2, 9)
    nParts <- Gen.choose(1, 6)
    cuts <- Gen.listOfN(nParts - 1, Gen.choose(0, keys.size))
  } yield (keys, k, cuts.sorted)

  test("every key with count > n/k survives partitioned summaries + merge") {
    cases(caseGen) { case (keys, k, cuts) =>
      val bounds = (0 +: cuts) :+ keys.size
      val parts = bounds.sliding(2).map { case Seq(a, b) => keys.slice(a, b) }.toSeq
      val summaries = parts.map(_.foldLeft(mutable.Map.empty[String, Long]) {
        (m, key) => HeavyHitters.add(m, key, k)
      })
      val merged = summaries.reduce((a, b) => HeavyHitters.merge(a, b, k))
      assert(merged.size <= k, s"summary overflow: ${merged.size} > $k")
      val exact = keys.groupBy(identity).view.mapValues(_.size.toLong)
      val n = keys.size.toLong
      val heavy = exact.collect { case (key, c) if c * k > n => key }.toSet
      val missed = heavy -- merged.keySet
      assert(missed.isEmpty,
        s"k=$k parts=${parts.map(_.size)} lost heavy keys $missed (exact=${heavy.map(h => h -> exact(h))})")
      // undercount bound: merged counter never exceeds the true count,
      // and undershoots by at most n/k
      merged.foreach { case (key, c) =>
        val t = exact.getOrElse(key, 0L)
        assert(c <= t, s"overcount for $key: $c > $t")
        assert(t - c <= n / k + 1, s"undercount bound broken for $key: $t - $c > ${n / k}")
      }
    }
  }
}
