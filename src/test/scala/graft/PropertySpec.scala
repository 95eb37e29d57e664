package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator-driven properties for the driver-side
  * algorithmic pieces — parsers and iterators whose correctness doesn't
  * need a Spark job. Deterministic: fixed seed, 200 cases each. */
class PropertySpec extends SparkSpec {

  private def cases[A](gen: Gen[A], n: Int = 200)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(check)
    }

  test("FieldSelection round-trip: rendered spec reparses to itself") {
    import graft.ops.FieldSelection._
    val specGen = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.choose(0, 20).map(Single(_)),
      for { a <- Gen.choose(0, 10); b <- Gen.choose(0, 10) }
        yield Range(math.min(a, b), math.max(a, b)),
      Gen.choose(0, 20).map(OpenRange(_))))
    cases(specGen) { specs =>
      val rendered = specs.map {
        case Single(i) => i.toString
        case Range(a, b) => s"$a-$b"
        case OpenRange(a) => s"$a-"
      }.mkString(",")
      assert(parseSpec(rendered) == specs)
    }
  }

  test("GroupedIterator reconstructs exactly the adjacent groups") {
    import graft.ops.SecondarySort.GroupedIterator
    cases(Gen.listOf(Gen.choose(0, 5))) { xs =>
      val sorted = xs.sorted
      val groups = new GroupedIterator[Int, Int](sorted.iterator, identity)
        .map { case (k, it) => (k, it.toList) }.toList
      assert(groups.map(_._1) == sorted.distinct.sorted)
      assert(groups.flatMap(_._2) == sorted)
      assert(groups.forall { case (k, vs) => vs.forall(_ == k) })
    }
  }

  test("GroupedIterator drains abandoned groups") {
    import graft.ops.SecondarySort.GroupedIterator
    cases(Gen.listOf(Gen.choose(0, 4))) { xs =>
      val sorted = xs.sorted
      // consume only the keys, never the value iterators
      val keys = new GroupedIterator[Int, Int](sorted.iterator, identity)
        .map(_._1).toList
      assert(keys == sorted.distinct.sorted)
    }
  }

  test("KeyFieldSort spec parse handles arbitrary field bounds") {
    import graft.ops.KeyFieldSort._
    val g = for {
      a <- Gen.choose(1, 9); b <- Gen.choose(1, 9)
      flags <- Gen.oneOf("", "n", "r", "nr")
    } yield (a, b, flags)
    cases(g) { case (a, b, flags) =>
      val parsed = parse(s"-k$a,$b$flags")
      assert(parsed == Seq(KeySpec(a, Some(b), flags.contains('n'), flags.contains('r'))))
    }
  }
}
