package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic pins for [[Dsir]] beyond the q236 oracle replay: the
  * importance score actually separates target-like from
  * non-target-like documents, the weight table covers the full
  * bucket spine, and featureless documents score null. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies: "medical" target domain vs web noise
  private def med(i: Int) = s"patient dose trial cohort placebo m$i"
  private def web(i: Int) = s"click buy cheap deal subscribe w$i"

  // null text (not "": the tokenizer gives "" one empty-token
  // feature, the q230-pinned behavior) is the featureless case
  private val corpus = (
    (0 until 10).map(i => (i.toLong, med(i))) ++
    (10 until 30).map(i => (i.toLong, web(i))) ++
    Seq((99L, null.asInstanceOf[String]))).toDF("doc_id", "text")

  test("target-vocabulary documents outscore off-domain documents") {
    val target = corpus.where(col("doc_id") < 10) // the medical slice
    val w = Dsir.weights(corpus, target, "doc_id", "text", buckets = 256)
    val scores = Dsir.score(corpus, w, "doc_id", "text", buckets = 256)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val medScores = (0 until 10).map(i => scores(i.toLong).get)
    val webScores = (10 until 30).map(i => scores(i.toLong).get)
    assert(medScores.min > webScores.max,
      s"importance must separate domains: med=$medScores web=$webScores")
    // featureless doc: null score, present in output
    assert(scores(99L).isEmpty)
  }

  test("weights cover the full bucket spine with exact totals") {
    val w = Dsir.weights(corpus, corpus.where(col("doc_id") < 10),
        "doc_id", "text", buckets = 64)
      .collect()
    assert(w.length == 64)
    val buckets = w.map(_.getLong(0)).toSet
    assert(buckets == (0L until 64L).toSet)
    // raw count total = number of (doc, distinct-feature) pairs
    val nPairs = corpus
      .select(col("doc_id"), explode(graft.functions.SketchExpressions
        .shingleHashes64(col("text"), 1)).as("h"))
      .count()
    assert(w.map(_.getLong(2)).sum == nPairs)
    // target slice is a subset: target totals <= raw totals per bucket
    assert(w.forall(r => r.getLong(1) <= r.getLong(2)))
  }
}
