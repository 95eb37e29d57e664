package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[CdcCuts]]/[[TextFunctions.cdcChunkHashes]] against an
  * independent direct-sum polynomial implementation (no rolling
  * update — a different algorithm computing the same definition) and
  * the reassembly invariant. */
class CdcCutsSpec extends SparkSpec {
  import spark.implicits._

  private val P = (1L << 31) - 1
  private val B = 263L

  /** Direct-sum reference: hash of window ending at 1-based pos e. */
  private def refCuts(s: String, k: Int, mod: Int): Seq[Int] = {
    val cp = s.codePoints().toArray
    (k to cp.length).filter { e =>
      var h = 0L
      for (j <- e - k until e) h = (h * B + cp(j)) % P
      h % mod == 0
    }
  }

  private def cuts(s: String, k: Int = 8, mod: Int = 64): Seq[Int] =
    Seq(s).toDF("t").select(TextFunctions.cdcCuts(col("t"), k, mod))
      .as[Seq[Int]].head()

  test("matches the direct-sum reference on random ASCII strings") {
    val rnd = new scala.util.Random(20260813L) // deterministic
    // batch all 60 samples into ONE query — per-sample head() would
    // pay a Spark job each
    val samples = Seq.fill(60)(
      Seq.fill(rnd.nextInt(80))((' ' + rnd.nextInt('~' - ' ' + 1)).toChar).mkString)
    val got = samples.toDF("t")
      .select(TextFunctions.cdcCuts(col("t"), 4, 16)).as[Seq[Int]].collect()
    samples.zip(got).foreach { case (s, g) =>
      assert(g == refCuts(s, 4, 16), s"text=$s")
    }
  }

  test("mod 2 on a longer string produces interior cuts in [k, len]") {
    val s = "the quick brown fox jumps over the lazy dog" * 3
    val got = cuts(s, 8, 2)
    assert(got.nonEmpty)
    assert(got == got.sorted && got.distinct == got)
    assert(got.forall(e => e >= 8 && e <= s.length))
    assert(got == refCuts(s, 8, 2))
  }

  test("text shorter than k has no cuts; empty text has no chunks") {
    assert(cuts("short", 8, 2).isEmpty)
    val hashes = Seq("").toDF("t")
      .select(TextFunctions.cdcChunkHashes(col("t"), 8, 64))
      .as[Seq[String]].head()
    assert(hashes.isEmpty)
  }

  test("chunk hashes are the md5s of the substrings between cuts, reassembling the text") {
    val s = "abcdefghij klmnopqrst uvwxyz 0123456789 the end of the text"
    val k = 4; val mod = 8
    val cs = cuts(s, k, mod)
    val bounds = (0 +: cs :+ s.length).distinct
    val pieces = bounds.zip(bounds.tail).map { case (a, b) => s.substring(a, b) }
    assert(pieces.mkString == s) // reassembly invariant
    val exp = pieces.map(p => {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(p.getBytes("UTF-8")).map("%02x".format(_)).mkString
    })
    val got = Seq(s).toDF("t")
      .select(TextFunctions.cdcChunkHashes(col("t"), k, mod))
      .as[Seq[String]].head()
    assert(got == exp)
  }

  test("a shifted prefix re-synchronizes chunk boundaries (the CDC property)") {
    val base = "the quick brown fox jumps over the lazy dog and keeps running far away" * 4
    val shifted = "XYZ" + base
    val h1 = Seq(base).toDF("t")
      .select(TextFunctions.cdcChunkHashes(col("t"), 8, 16)).as[Seq[String]].head()
    val h2 = Seq(shifted).toDF("t")
      .select(TextFunctions.cdcChunkHashes(col("t"), 8, 16)).as[Seq[String]].head()
    // all chunks after the first boundary following the edit are shared
    assert(h1.toSet.intersect(h2.toSet).nonEmpty,
      s"no shared chunks: $h1 vs $h2")
  }

  test("mod < 2 is rejected") {
    intercept[IllegalArgumentException] { CdcCuts(null, 8, 1) }
  }

  test("SQL surface: cdc_cuts registered with literal-checked args") {
    graft.core.GraftExtensions.register(spark)
    val r = spark.sql("SELECT cdc_cuts('abcdefghijklmnop', 4, 4) AS c")
      .as[Seq[Int]].head()
    assert(r == refCuts("abcdefghijklmnop", 4, 4))
  }
}
