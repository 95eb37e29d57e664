package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Shuffling.shard]]: positions are the md5-order permutation,
  * shards are balanced round-robin, the walk is deterministic under
  * physical reordering, and duplicate ids fail loudly. */
class ShufflingSpec extends SparkSpec {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("pos is the 0-based rank in md5(id)||id order; shard round-robin") {
    val ids = (0L until 100L).toSeq
    val got = Shuffling.shard(ids.toDF("id"), "id", numShards = 8)
      .select("id", "pos", "shard", "pos_in_shard")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val expectedOrder = ids.sortBy(i => md5Hex(i.toString) + i.toString)
    val expectedPos = expectedOrder.zipWithIndex.toMap
    got.foreach { case (id, pos, shard, pis) =>
      assert(pos == expectedPos(id), s"id=$id")
      assert(shard == pos % 8 && pis == pos / 8, s"id=$id")
    }
    // a permutation: every position exactly once
    assert(got.map(_._2).sorted.toSeq == (0L until 100L))
  }

  test("shard sizes differ by at most one row") {
    val got = Shuffling.shard((0L until 103L).toDF("id"), "id", 8)
      .groupBy("shard").count().as[(Long, Long)].collect().toMap
    assert(got.keys.toSet == (0L until 8L).toSet)
    assert(got.values.max - got.values.min <= 1, got.toString)
  }

  test("deterministic under repartitioning; extra columns ride along") {
    val df = (0L until 50L).map(i => (i, s"t$i")).toDF("id", "payload")
    val a = Shuffling.shard(df, "id", 4)
      .select("id", "pos", "payload").as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    val b = Shuffling.shard(df.repartition(13), "id", 4)
      .select("id", "pos", "payload").as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(a == b)
    assert(a.forall { case (id, _, p) => p == s"t$id" })
  }

  test("duplicate ids fail loudly (packing's unique-walk contract)") {
    val e = intercept[Exception] {
      Shuffling.shard(Seq(1L, 2L, 2L).toDF("id"), "id", 2).count()
    }
    assert(e.getMessage != null)
  }
}
