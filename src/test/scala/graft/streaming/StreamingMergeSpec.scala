package graft.streaming

import graft.SparkSpec
import graft.ops.Merge
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming-vs-batch parity for [[Merge.applyChangesStream]]: after
  * any prefix of micro-batches, the maintained snapshot must equal the
  * batch [[Merge.applyChanges]] of those batches CONCATENATED —
  * including the nasty interleavings (stale upsert arriving in a later
  * batch than the delete it precedes in the log). */
class StreamingMergeSpec extends SparkSpec {
  import spark.implicits._

  private val key = Seq("id")

  test("stream-applied snapshot equals batch applyChanges of the concatenated batches") {
    implicit val sqlCtx = spark.sqlContext
    val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "name", "v")
    val batches: Seq[Seq[(Long, String, Long, String, Long)]] = Seq(
      // in-batch compaction: two changes for key 4, the later wins
      Seq((2L, "b2", 21L, "U", 5L), (4L, "d", 40L, "I", 6L),
        (4L, "d2", 41L, "U", 7L)),
      // delete of present key, insert, delete-of-absent (no-op)
      Seq((1L, "", 0L, "D", 8L), (5L, "e", 50L, "I", 9L),
        (9L, "", 0L, "D", 10L)),
      // a STALE upsert for the deleted key (ord 2 < the delete's 8)
      // arriving a batch later — must stay dead; plus a normal update
      Seq((1L, "zombie", 11L, "U", 2L), (3L, "c3", 33L, "U", 12L)))

    val ms = MemoryStream[(Long, String, Long, String, Long)]
    val snapDir = java.nio.file.Files.createTempDirectory("mrgsnap").toString
    val ckDir = java.nio.file.Files.createTempDirectory("mrgck").toString
    val q = Merge.applyChangesStream(
      ms.toDF().toDF("id", "name", "v", "op", "ord"),
      base, key, "op", "ord", snapDir, ckDir)
    try {
      var applied = Seq.empty[(Long, String, Long, String, Long)]
      batches.foreach { b =>
        ms.addData(b: _*)
        q.processAllAvailable()
        applied ++= b
        val streamed = Merge.snapshot(spark, snapDir)
          .as[(Long, String, Long)].collect().toSet
        val batch = Merge.applyChanges(base,
            applied.toDF("id", "name", "v", "op", "ord"), key, "op", "ord")
          .as[(Long, String, Long)].collect().toSet
        assert(streamed == batch, s"after ${applied.size} changes")
      }
      val fin = Merge.snapshot(spark, snapDir)
        .as[(Long, String, Long)].collect().toSet
      assert(!fin.exists(_._1 == 1L), "stale post-delete upsert resurrected key 1")
      assert(fin == Set((2L, "b2", 21L), (3L, "c3", 33L),
        (4L, "d2", 41L), (5L, "e", 50L)))
    } finally q.stop()
  }

  test("versioned snapshots retain per-batch history (v0..vN)") {
    implicit val sqlCtx = spark.sqlContext
    val base = Seq((1L, 100L)).toDF("id", "v")
    val ms = MemoryStream[(Long, Long, String, Long)]
    val snapDir = java.nio.file.Files.createTempDirectory("mrgsnap2").toString
    val ckDir = java.nio.file.Files.createTempDirectory("mrgck2").toString
    val q = Merge.applyChangesStream(ms.toDF().toDF("id", "v", "op", "ord"),
      base, key, "op", "ord", snapDir, ckDir)
    try {
      ms.addData((2L, 200L, "I", 1L)); q.processAllAvailable()
      ms.addData((1L, 101L, "U", 2L)); q.processAllAvailable()
      val dirs = new java.io.File(snapDir).listFiles().map(_.getName).toSet
      assert(dirs.contains("v0") && dirs.contains("v1"), dirs.toString)
      // v0 reflects only the first batch
      val v0 = spark.read.parquet(s"$snapDir/v0")
        .where(org.apache.spark.sql.functions.col("__op") =!= "D")
        .select("id", "v").as[(Long, Long)].collect().toSet
      assert(v0 == Set((1L, 100L), (2L, 200L)))
      val live = Merge.snapshot(spark, snapDir)
        .as[(Long, Long)].collect().toSet
      assert(live == Set((1L, 101L), (2L, 200L)))
    } finally q.stop()
  }

  test("same-ord redelivery is idempotent; same-ord CONFLICT fails loudly") {
    implicit val sqlCtx = spark.sqlContext
    val base = Seq((1L, 100L)).toDF("id", "v")
    val ms = MemoryStream[(Long, Long, String, Long)]
    val snapDir = java.nio.file.Files.createTempDirectory("mrgsnap3").toString
    val ckDir = java.nio.file.Files.createTempDirectory("mrgck3").toString
    val q = Merge.applyChangesStream(ms.toDF().toDF("id", "v", "op", "ord"),
      base, key, "op", "ord", snapDir, ckDir)
    try {
      ms.addData((2L, 200L, "I", 5L)); q.processAllAvailable()
      // exact redelivery of the applied change in a LATER batch:
      // absorbed, snapshot unchanged (the at-least-once contract)
      ms.addData((2L, 200L, "I", 5L)); q.processAllAvailable()
      val live = Merge.snapshot(spark, snapDir)
        .as[(Long, Long)].collect().toSet
      assert(live == Set((1L, 100L), (2L, 200L)))
      // same ord, DIFFERENT content across batches: the stream must
      // raise like the batch path's duplicate-ord guard, not silently
      // pick a side (parity would otherwise break on buggy logs)
      ms.addData((2L, 999L, "U", 5L))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("conflicting changes share")), msgs(e).toString)
      // the committed snapshot is still readable and unchanged (the
      // failed version never wrote _SUCCESS)
      val after = Merge.snapshot(spark, snapDir)
        .as[(Long, Long)].collect().toSet
      assert(after == Set((1L, 100L), (2L, 200L)))
    } finally q.stop()
  }
}
