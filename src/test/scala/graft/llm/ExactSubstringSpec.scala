package graft.llm

import graft.SparkSpec

/** Pins [[ExactSubstring.duplicatedExtents]] against a naive
  * quadratic reference: enumerate every length-minRun window, count
  * verbatim occurrences by brute force, merge consecutive duplicated
  * window-starts — the definition executed literally. */
class ExactSubstringSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference on raw token windows (no hashing). */
  private def reference(docs: Seq[(Long, String)], minRun: Int): Set[(Long, Int, Int, Int)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSeq
    }
    val windows = for {
      (id, ws) <- toks
      i <- 0 to ws.length - minRun
    } yield (id, i + 1, ws.slice(i, i + minRun).mkString(" "))
    val counts = windows.groupBy(_._3).view.mapValues(_.size).toMap
    val dupStarts = windows.filter(w => counts(w._3) >= 2)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    dupStarts.flatMap { case (id, starts) =>
      // merge consecutive starts into maximal runs
      val runs = starts.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, i) if i == e + 1 => (s, i) :: rest
        case (acc, i) => (i, i) :: acc
      }.reverse
      runs.map { case (s, e) =>
        (id, s, e + minRun - 1, e + minRun - 1 - s + 1)
      }
    }.toSet
  }

  private def run(docs: Seq[(Long, String)], minRun: Int): Set[(Long, Int, Int, Int)] =
    ExactSubstring.duplicatedExtents(docs.toDF("doc_id", "text"),
        "doc_id", "text", minRun)
      .as[(Long, Int, Int, Int)].collect().toSet

  test("matches the quadratic reference on a crafted fixture") {
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      // shared 10-word boilerplate inside distinct bodies
      1L -> s"alpha beta $boiler gamma delta epsilon zeta eta theta",
      2L -> s"one two three $boiler four five six seven eight nine",
      // a doc repeating its own 8-gram internally (same-doc duplication)
      3L -> ("x1 x2 x3 x4 x5 x6 x7 x8 mid1 mid2 mid3 " +
        "x1 x2 x3 x4 x5 x6 x7 x8 tail1 tail2"),
      // no duplication at all
      4L -> (1 to 30).map(i => s"u$i").mkString(" "),
      // too short to carry a full window
      5L -> "s1 s2 s3")
    val got = run(docs, 4)
    val want = reference(docs, 4)
    assert(want.nonEmpty, "fixture must contain duplicated spans")
    assert(got == want, s"\ngot:  ${got.toSeq.sorted}\nwant: ${want.toSeq.sorted}")
    assert(!got.exists(_._1 == 4L) && !got.exists(_._1 == 5L))
  }

  test("matches the reference on random near-dup corpora (several minRun values)") {
    val rnd = new scala.util.Random(31)
    val vocab = (1 to 40).map(i => s"w$i")
    def doc(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = doc(60)
    val docs: Seq[(Long, String)] = Seq(
      1L -> base,
      // near-copy: same text with a few words substituted
      2L -> base.split(" ").zipWithIndex
        .map { case (w, i) => if (i % 17 == 0) "CHANGED" else w }.mkString(" "),
      3L -> doc(50), 4L -> doc(50), 5L -> (doc(20) + " " + base.split(" ").take(25).mkString(" ")))
    for (minRun <- Seq(3, 5, 8)) {
      val got = run(docs, minRun)
      val want = reference(docs, minRun)
      assert(got == want, s"minRun=$minRun\ngot:  ${got.toSeq.sorted.take(20)}\nwant: ${want.toSeq.sorted.take(20)}")
    }
    assert(run(docs, 3).nonEmpty)
  }

  test("every extent is at least minRun long and extents never touch") {
    val rnd = new scala.util.Random(7)
    val vocab = (1 to 15).map(i => s"v$i")
    val docs: Seq[(Long, String)] = (1L to 6L).map(i =>
      i -> Seq.fill(80)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val got = run(docs, 4).toSeq
    assert(got.nonEmpty, "small vocab must force repeated 4-grams")
    got.foreach { case (_, s, e, n) =>
      assert(n >= 4 && n == e - s + 1)
    }
    // within a doc, maximal runs of window STARTS are separated by
    // ≥ 2 start positions (adjacent starts would have merged)
    got.groupBy(_._1).values.foreach { es =>
      val sorted = es.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Seq((_, _, _, _), _) if sorted.size < 2 => ()
        case Seq((_, s1, e1, _), (_, s2, _, _)) =>
          assert(s2 > e1 - 4 + 1 + 1, s"starts $s1,$s2 should have merged")
        case _ => ()
      }
    }
  }

  test("runs of repeated spaces do not split an extent") {
    val span = (1 to 8).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      1L -> s"a b  $span   c d",
      2L -> s"e f $span g h")
    val got = run(docs, 8)
    // the span sits at renumbered positions 3..10 in both docs
    assert(got == Set((1L, 3, 10, 8), (2L, 3, 10, 8)), got.toString)
  }
}
