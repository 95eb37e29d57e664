package graft.tools

import graft.core.{Engine, Tables}
import graft.llm.Dedup

/** Scratch profiler for the q27 sketch→verify pipeline. Not part of
  * the declared surface.
  */
object ProfileQ27 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("profile-q27")
    val docs = Tables.documents(spark, sfDir)
    val wdocs = Tables.documents(spark, "/root/testdata/sf0.001")
    Dedup.minHashVerifiedPairs(wdocs, "doc_id", "text", 3, 0.5)
      .write.mode("overwrite").format("noop").save()
    println("=== warmup done ===")
    (1 to 3).foreach { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val r = Dedup.minHashVerifiedPairs(docs, "doc_id", "text", 3, 0.5)
      val cnt = r.count()
      println(f"=== RUN $i: ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$cnt ===")
    }
    spark.stop()
  }
}
