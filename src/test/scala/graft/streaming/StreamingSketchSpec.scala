package graft.streaming

import graft.SparkSpec
import graft.ops.CountMin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** [[CountMin.sketch]] is a plain hash aggregate, so it runs UNCHANGED
  * as a Structured Streaming stateful agg in complete mode: the cell
  * grid after the last micro-batch equals the batch sketch over the
  * same rows — the "maintain a sketch over an arriving corpus" shape,
  * with state bounded by d·w cells rather than distinct keys. */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  test("streaming count-min cells equal the batch sketch after the last micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val keys = (1 to 300).map(i => s"k${i % 41}")
    val ms = MemoryStream[String]
    val q = CountMin.sketch(ms.toDF().toDF("k"), "k", d = 4, w = 32)
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      val (a, b) = keys.splitAt(137)
      ms.addData(a: _*); q.processAllAvailable()
      ms.addData(b: _*); q.processAllAvailable()
      val streamed = spark.table("cms_stream")
        .as[(Long, Long, Long)].collect().toSet
      val batch = CountMin.sketch(keys.toDF("k"), "k", d = 4, w = 32)
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }
}
