package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("wordShingles produces distinct n-grams, empty below n tokens") {
    val df = Seq("a b c d", "a b").toDF("t")
    val out = df.select(TextFunctions.wordShingles(col("t"), 3).as("g"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1).isEmpty)
  }

  test("fingerprint is whitespace/case insensitive") {
    val df = Seq(("A  b\tC", "a b c")).toDF("x", "y")
    val r = df.select(
      TextFunctions.fingerprint(col("x")).as("fx"),
      TextFunctions.fingerprint(col("y")).as("fy")).head
    assert(r.getString(0) == r.getString(1))
  }

  test("prefixFingerprint ignores trailing words") {
    val df = Seq(("a b c d e extra words", "a b c d e different")).toDF("x", "y")
    val r = df.select(
      TextFunctions.prefixFingerprint(col("x"), 5).as("fx"),
      TextFunctions.prefixFingerprint(col("y"), 5).as("fy")).head
    assert(r.getString(0) == r.getString(1))
  }

  test("stopwordCount counts with multiplicity") {
    val df = Seq("the cat and the dog").toDF("t")
    assert(df.select(TextFunctions.stopwordCount(col("t"),
      Seq("the", "and")).as("n")).head.getLong(0) == 3L)
  }

  test("langId picks the language with most marker hits") {
    val df = Seq(
      "the cat and the dog is here",
      "der hund und die katze ist nicht da",
      "xyzzy qwerty").toDF("t")
    val out = df.select(TextFunctions.langId(col("t")).as("l")).as[String].collect()
    assert(out.toSeq == Seq("en", "de", "und"))
  }

  test("punctRatio does not count capitals as noise") {
    val df = Seq(("ALL CAPS TEXT", "all caps text")).toDF("u", "l")
    val r = df.select(TextFunctions.punctRatio(col("u")).as("pu"),
      TextFunctions.punctRatio(col("l")).as("pl")).head
    assert(r.getDouble(0) == r.getDouble(1))
  }

  test("qualityScore stays in [0,1] and penalizes junk") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and runs to the hills for a long time today",
      "!!! ??? ###").toDF("t")
    val out = df.select(TextFunctions.qualityScore(col("t")).as("q")).as[Double].collect()
    assert(out.forall(q => q >= 0.0 && q <= 1.0))
    assert(out(0) > out(1))
  }

  test("redactPii scrubs emails, IPs and phone runs; leaves clean text alone") {
    def scrub(s: String): String =
      Seq(s).toDF("t").select(TextFunctions.redactPii(col("t"))).head.getString(0)
    assert(scrub("mail bob.smith+x@corp.example.org now")
      == "mail <EMAIL> now")
    assert(scrub("host 192.168.0.1 and 10.0.255.7 up") == "host <IP> and <IP> up")
    assert(scrub("call +1 555 0199 today") == "call <PHONE> today")
    assert(scrub("a@b.co c@d.io") == "<EMAIL> <EMAIL>")
    // order matters: the email's digits must not become a <PHONE>
    assert(scrub("u123456789@ex.com") == "<EMAIL>")
    assert(scrub("plain words only") == "plain words only")
    // too-short digit runs are not phones
    assert(scrub("version 12345 ok") == "version 12345 ok")
  }

  test("bpeTokens splits contractions, digit runs, and punctuation like a BPE pre-tokenizer") {
    val df = Seq("I can't pay 100 dollars!!").toDF("t")
    val toks = df.select(TextFunctions.bpeTokens(col("t")).as("bt"))
      .as[Seq[String]].collect().head
    assert(toks == Seq("I", " can", "'t", " pay", " 100", " dollars", "!!"), toks)
    val counts = df.select(TextFunctions.bpeTokenCount(col("t")),
      TextFunctions.tokenCount(col("t"))).as[(Long, Long)].collect().head
    assert(counts == (7L, 5L), counts)
  }

  test("tokenCount matches documents.n_chars-derived expectations") {
    val docs = graft.core.Tables.documents(spark, sf)
    val bad = docs.select(TextFunctions.tokenCount(col("text")).as("n"))
      .where(col("n") <= 0).count()
    assert(bad == 0)
  }
}

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine on known vectors") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),   // orthogonal → 0
      (Seq(1.0f, 2.0f), Seq(2.0f, 4.0f)),   // parallel → 1
      (Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f))). // opposite → -1
      toDF("a", "b")
    val out = df.select(round(VectorFunctions.cosine(col("a"), col("b")), 6).as("c"))
      .as[Double].collect()
    assert(out.toSeq == Seq(0.0, 1.0, -1.0))
  }

  test("codegen cosineFast agrees with Column-tier cosine on real embeddings") {
    val emb = graft.core.Tables.embeddings(spark, sf).limit(100)
    val q = emb.select(col("embedding").as("qe")).limit(1)
    val both = emb.crossJoin(q).select(
      VectorFunctions.cosine(col("embedding"), col("qe")).as("slow"),
      VectorFunctions.cosineFast(col("embedding"), col("qe")).as("fast"))
    val maxDiff = both.select(max(abs(col("slow") - col("fast")))).head.getDouble(0)
    assert(maxDiff < 1e-12)
  }

  test("cosineFast returns null on length mismatch") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f))).toDF("a", "b")
    assert(df.select(VectorFunctions.cosineFast(col("a"), col("b"))).head.isNullAt(0))
  }

  test("zero vector yields null, not NaN") {
    val df = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    assert(df.select(VectorFunctions.cosineFast(col("a"), col("b"))).head.isNullAt(0))
  }

  test("vectorMean aggregates elementwise means per group (partial-merging udaf)") {
    val df = Seq(
      ("a", Seq(1.0, 2.0, 3.0)), ("a", Seq(3.0, 4.0, 5.0)),
      ("b", Seq(10.0, 0.0, -2.0))).toDF("k", "v")
      // spread group 'a' over partitions so merge() actually runs
      .repartition(4)
    val mean = VectorFunctions.vectorMean(3)
    val out = df.groupBy("k").agg(mean(col("v")).as("m"))
      .orderBy("k").as[(String, Seq[Double])].collect()
    assert(out(0) == (("a", Seq(2.0, 3.0, 4.0))))
    assert(out(1) == (("b", Seq(10.0, 0.0, -2.0))))
  }

  test("vectorMean of an empty group is null") {
    val df = Seq(("a", null.asInstanceOf[Seq[Double]])).toDF("k", "v")
    val mean = VectorFunctions.vectorMean(3)
    // Aggregator semantics: null inputs are skipped before reduce, so
    // an all-null group hits finish() with count 0 → null
    val r = df.groupBy("k").agg(mean(col("v")).as("m")).head
    assert(r.isNullAt(1))
  }
}
