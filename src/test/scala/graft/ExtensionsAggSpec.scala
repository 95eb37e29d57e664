package graft

import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  graft.core.GraftExtensions.register(spark)

  test("cosine_similarity is callable from SQL") {
    val r = spark.sql(
      "SELECT cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }

  test("cosine_similarity accepts float arrays (the embeddings type)") {
    graft.core.Tables.embeddings(spark, sf).limit(5).createOrReplaceTempView("e5")
    val r = spark.sql(
      "SELECT cosine_similarity(embedding, embedding) AS c FROM e5")
    assert(r.collect().forall(row => math.abs(row.getDouble(0) - 1.0) < 1e-9))
  }

  test("shingle_hashes and minhash_signature compose in SQL") {
    val r = spark.sql(
      "SELECT size(minhash_signature(shingle_hashes('a b c d e', 3))) AS k").head
    assert(r.getInt(0) == 64)
  }

  test("simhash64 from SQL matches the DataFrame tier") {
    graft.core.Tables.documents(spark, sf).limit(20).createOrReplaceTempView("d20")
    val viaSql = spark.sql("SELECT doc_id, simhash64(split(text, ' ')) AS sh FROM d20")
    val viaDf = graft.core.Tables.documents(spark, sf).limit(20)
      .select(col("doc_id"), graft.llm.Dedup.simHash(col("text")).as("sh"))
    assert(viaSql.except(viaDf).count() == 0)
  }

  test("extensions path registers the same functions at session build") {
    // verify the injection list is well-formed (names + builders),
    // the real withExtensions path needs a fresh JVM-level session
    assert(graft.core.GraftExtensions.definitions.map(_._1).toSet ==
      Set("cosine_similarity", "simhash64", "shingle_hashes", "minhash_signature",
        "repetition_stats", "rolling_winnow", "cdc_cuts", "jaro_winkler",
        "fold_text", "html_to_text", "html_blocks", "canonical_url",
        "robots_allowed", "html_meta", "registered_domain",
        "public_suffix", "meta_refresh_url", "strip_tracking_params"))
  }
}

class ValueHistogramAggSpec extends SparkSpec {
  import graft.agg.ValueHistogramAgg

  test("typed aggregator report matches built-in aggregates") {
    val ev = graft.core.Tables.events(spark, sf)
    val got = ev.groupBy("event_type")
      .agg(ValueHistogramAgg.histogram(col("value")).as("h"))
      .select(col("event_type"), col("h.count").as("n"),
        round(col("h.mean"), 6).as("mean"), round(col("h.stddev"), 6).as("sd"),
        col("h.min").as("mn"), col("h.max").as("mx"))
    val expected = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(avg("value"), 6).as("mean"),
        round(stddev_pop("value"), 6).as("sd"),
        min("value").as("mn"), max("value").as("mx"))
    assert(got.except(expected).count() == 0 && expected.except(got).count() == 0)
  }

  test("empty-input report is well-defined") {
    import spark.implicits._
    val empty = Seq.empty[Double].toDF("v")
    val r = empty.agg(ValueHistogramAgg.histogram(col("v")).as("h"))
      .select("h.count").head
    assert(r.getLong(0) == 0L)
  }
}
