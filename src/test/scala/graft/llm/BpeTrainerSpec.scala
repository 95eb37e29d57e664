package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[BpeTrainer]] against an independent naive implementation
  * (driver-side maps, written without the fold trick) plus the
  * classic Sennrich worked example. */
class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference: literal Sennrich algorithm on a Map. */
  private def naive(words: Map[String, Long], nMerges: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, c) => w.split("").toVector -> c }
    val out = Seq.newBuilder[(String, String, Long)]
    var continue = true
    var i = 0
    while (i < nMerges && continue) {
      val pairCounts = vocab.toSeq.flatMap { case (syms, c) =>
        syms.sliding(2).collect { case Vector(a, b) => (a, b) -> c }.toSeq
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (pairCounts.isEmpty) continue = false
      else {
        val ((a, b), f) = pairCounts.toSeq.minBy { case ((a, b), f) => (-f, a, b) }
        out += ((a, b, f))
        vocab = vocab.map { case (syms, c) =>
          val merged = syms.foldLeft(Vector.empty[String]) { (acc, s) =>
            if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (a + b)
            else acc :+ s
          }
          merged -> c
        }
        i += 1
      }
    }
    out.result()
  }

  private def learn(words: Map[String, Long], n: Int) =
    BpeTrainer.learnMerges(words.toSeq.toDF("w", "c"), "w", "c", n)
      .map(m => (m.a, m.b, m.freq))

  test("Sennrich worked example: first merges are es, est, lo") {
    val corpus = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val got = learn(corpus, 3)
    assert(got == naive(corpus, 3), got.toString)
    assert(got.take(2) == Seq(("e", "s", 9L), ("es", "t", 9L)), got.toString)
  }

  test("greedy non-overlap: merge (a,a) on aaa leaves [aa, a]") {
    val seg = Seq("aaa").toDF("w")
      .select(BpeTrainer.segment(col("w"), Seq(BpeTrainer.Merge("a", "a", 0L))).as("s"))
      .head().getSeq[String](0)
    assert(seg == Seq("aa", "a"), seg.toString)
  }

  test("matches the naive reference on randomized corpora") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val words = (1 to 20).map { _ =>
        val len = 1 + rnd.nextInt(6)
        val w = (1 to len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
        w -> (1L + rnd.nextInt(9))
      }.toMap // toMap dedups — counts stay deterministic per word
      val n = 1 + rnd.nextInt(6)
      assert(learn(words, n) == naive(words, n), s"words=$words n=$n")
    }
  }

  test("exhaustion: stops early when every word is one symbol") {
    val got = learn(Map("ab" -> 3L, "cd" -> 2L), 10)
    assert(got == Seq(("a", "b", 3L), ("c", "d", 2L)), got.toString)
  }

  test("segment applies learned merges to unseen words") {
    val merges = learn(Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 3)
    val mseq = merges.map { case (a, b, f) => BpeTrainer.Merge(a, b, f) }
    val seg = Seq("lowest").toDF("w")
      .select(BpeTrainer.segment(col("w"), mseq).as("s"))
      .head().getSeq[String](0)
    // merges learned: (e,s), (es,t), (lo,?) — "lowest" must contain "est"
    assert(seg.contains("est"), seg.toString)
    assert(seg.mkString == "lowest", seg.toString) // lossless segmentation
  }

  test("segmentFast is byte-identical to segment on random corpora (differential)") {
    // train on one random corpus, tokenize ANOTHER (unseen words,
    // unseen symbols, overlap-heavy runs) through both paths
    val rnd = new scala.util.Random(7)
    val trainWords = (1 to 30).map { _ =>
      val len = 1 + rnd.nextInt(8)
      (1 to len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString ->
        (1L + rnd.nextInt(9))
    }.toMap
    val merges = BpeTrainer.learnMerges(
      trainWords.toSeq.toDF("w", "c"), "w", "c", 12)
    assert(merges.nonEmpty)
    val applyWords = ((1 to 60).map { _ =>
      val len = 1 + rnd.nextInt(10)
      (1 to len).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString // adds 'e'
    } ++ Seq("aaaa", "abababab", "", "zzz")).distinct
    val both = applyWords.toDF("w").select(col("w"),
      BpeTrainer.segment(col("w"), merges).as("slow"),
      BpeTrainer.segmentFast(col("w"), merges).as("fast"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"word=${r.getString(0)}: slow=${r.getSeq[String](1)} fast=${r.getSeq[String](2)}")
    }
    // plan-depth claim: the fast path is ONE expression regardless of
    // merge count — its expression tree doesn't grow with the table
    // (analyzed plan: the optimizer constant-folds local fixtures)
    val slowPlan = applyWords.toDF("w")
      .select(BpeTrainer.segment(col("w"), merges).as("s"))
      .queryExecution.analyzed.toString
    val fastPlan = applyWords.toDF("w")
      .select(BpeTrainer.segmentFast(col("w"), merges).as("s"))
      .queryExecution.analyzed.toString
    assert(fastPlan.length < slowPlan.length / 4,
      s"fast plan ${fastPlan.length}B vs slow ${slowPlan.length}B")
  }

  test("segmentFast handles code points beyond the BMP as single symbols") {
    val merges = Seq(BpeTrainer.Merge("😀", "x", 1L)) // 😀 + x
    val seg = Seq("😀x😀").toDF("w")
      .select(BpeTrainer.segmentFast(col("w"), merges).as("s"))
      .head().getSeq[String](0)
    assert(seg == Seq("😀x", "😀"), seg.toString)
  }
}
