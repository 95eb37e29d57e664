package graft.streaming

import graft.SparkSpec
import graft.ops.HeavyHitters
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming Misra-Gries leg: a running summary folded across
  * micro-batches via foreachBatch must keep the mergeable-summaries
  * guarantee over the WHOLE stream — every key whose true count
  * exceeds total/k is tracked, and no estimate undercounts by more
  * than total/k — for any batch split of the input. (Exact equality
  * with the batch summary is NOT the contract: merge order changes
  * which ≤ n/k mass is cut; the bound is what both share.) */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("streaming summary keeps the n/k survival + undercount bounds across batches") {
    implicit val sqlCtx = spark.sqlContext
    // 3 hot keys + a long cold tail; k=10 → threshold total/k
    val hot = Seq.fill(300)("a") ++ Seq.fill(200)("b") ++ Seq.fill(120)("c")
    val tail = (1 to 380).map(i => s"t$i")
    val keys = new scala.util.Random(42).shuffle(hot ++ tail) // 1000 rows
    val truth = keys.groupBy(identity).map { case (kk, v) => kk -> v.size.toLong }

    val k = 10
    val ms = MemoryStream[String]
    val summary = new HeavyHitters.StreamingSummary("k", k)
    val q = ms.toDF().toDF("k").writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => summary.ingest(b))
      .start()
    try {
      keys.grouped(250).foreach { chunk =>
        ms.addData(chunk: _*); q.processAllAvailable()
      }
    } finally q.stop()

    assert(summary.total == 1000L)
    val est = summary.candidates.map { case (kk, v) => kk.get -> v }
    val thr = summary.total / k
    // survival: every true heavy hitter is tracked
    truth.filter(_._2 > thr).foreach { case (kk, c) =>
      assert(est.contains(kk), s"heavy key $kk (count $c) lost by the stream summary")
    }
    // bounded error: estimate never exceeds truth, undercount ≤ n/k
    est.foreach { case (kk, v) =>
      val t = truth(kk)
      assert(v <= t, s"$kk over-counted: est $v > true $t")
      assert(t - v <= thr, s"$kk undercount ${t - v} exceeds n/k=$thr")
    }
    // state is bounded by k entries
    assert(est.size <= k)
  }

  test("null keys survive the streaming summary as their own bucket") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[java.lang.Integer]
    val summary = new HeavyHitters.StreamingSummary("k", 5)
    val q = ms.toDF().selectExpr("CASE WHEN value > 2 THEN NULL ELSE value END AS k")
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => summary.ingest(b))
      .start()
    try {
      ms.addData((1 to 10).map(i => i: java.lang.Integer): _*)
      q.processAllAvailable()
    } finally q.stop()
    val c = summary.candidates
    assert(summary.total == 10L)
    assert(c.contains(None), s"null bucket missing from $c")
    assert(c(None) == 8L) // values 3..10 went null
  }
}
