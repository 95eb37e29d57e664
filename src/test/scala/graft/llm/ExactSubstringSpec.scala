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

  /** Driver-side scrub replay: extents from [[reference]], canonical =
    * min (doc, start-gram occurrence), removal = union of non-kept
    * extent spans. */
  private def scrubReference(docs: Seq[(Long, String)], minRun: Int)
      : Map[Long, (Int, Int, Seq[String])] = {
    val toks = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSeq
    }.toMap
    val gramAt = (id: Long, s: Int) => toks(id).slice(s - 1, s - 1 + minRun).mkString(" ")
    val occ = for {
      (id, ws) <- toks.toSeq; i <- 1 to ws.length - minRun + 1
    } yield (gramAt(id, i), id, i)
    val canon = occ.groupBy(_._1).view
      .mapValues(_.map(o => (o._2, o._3)).min).toMap
    val removedSpans = reference(docs, minRun).toSeq.filter { case (id, s, _, _) =>
      canon(gramAt(id, s)) != ((id, s))
    }
    toks.map { case (id, ws) =>
      val dead = removedSpans.collect {
        case (d, s, e, _) if d == id => (s, e)
      }
      val kept = ws.zipWithIndex.collect {
        case (w, i) if !dead.exists { case (s, e) => i + 1 >= s && i + 1 <= e } => w
      }
      id -> ((ws.length, ws.length - kept.length, kept))
    }
  }

  test("scrub matches the driver-side canonical-keeper replay") {
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      1L -> s"alpha beta $boiler gamma delta epsilon zeta eta theta",
      2L -> s"one two three $boiler four five six seven eight nine",
      3L -> ("x1 x2 x3 x4 x5 x6 x7 x8 mid1 mid2 mid3 " +
        "x1 x2 x3 x4 x5 x6 x7 x8 tail1 tail2"),
      4L -> (1 to 30).map(i => s"u$i").mkString(" "))
    val want = scrubReference(docs, 4)
    val got = ExactSubstring.scrub(docs.toDF("doc_id", "text"),
        "doc_id", "text", 4)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(want.exists(_._2._2 > 0), "fixture must remove something")
    docs.foreach { case (id, _) =>
      val (n, rem, kept) = want(id)
      val keptMd5 = java.security.MessageDigest.getInstance("MD5")
        .digest(kept.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(got(id) == ((n.toLong, rem.toLong, keptMd5)),
        s"doc $id: got ${got(id)}, want ($n, $rem, $keptMd5)")
    }
    // doc 1 holds the canonical boilerplate (lowest doc id): untouched;
    // doc 2 loses exactly the boilerplate span; doc 3's self-repeat
    // loses the second copy; doc 4 is untouched
    assert(got(1L)._2 == 0L)
    assert(got(2L)._2 > 0L)
    assert(got(3L)._2 > 0L)
    assert(got(4L)._2 == 0L)
  }

  test("scrub on random corpora: counts consistent, canonical copy always survives") {
    val rnd = new scala.util.Random(17)
    val vocab = (1 to 30).map(i => s"w$i")
    def doc(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = doc(50)
    val docs: Seq[(Long, String)] = Seq(1L -> base, 2L -> base,
      3L -> doc(40), 4L -> (doc(10) + " " + base))
    val want = scrubReference(docs, 5)
    val got = ExactSubstring.scrub(docs.toDF("doc_id", "text"),
        "doc_id", "text", 5)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    docs.foreach { case (id, _) =>
      val (n, rem, _) = want(id)
      assert(got(id) == ((n.toLong, rem.toLong)), s"doc $id")
    }
    // doc 1 is the canonical full copy: nothing removed from it
    assert(got(1L)._2 == 0L)
    // doc 2 (verbatim copy) loses its whole duplicated span
    assert(got(2L)._2 > 0L)
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
