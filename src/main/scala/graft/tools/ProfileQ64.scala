package graft.tools

import graft.core.{Engine, Tables}
import org.apache.spark.sql.functions._

/** Scratch profiler for the q64 repetition map pass: measures the
  * headline shape (translate → signals, widened) at several forced
  * parallelism levels to separate per-task cost from parallelism.
  * Not part of the declared surface.
  */
object ProfileQ64 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("profile-q64")
    def base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), translate(col("text"), " ", "\n").as("text"))
    // warmup
    graft.llm.Repetition.signals(
      Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text")
      .write.mode("overwrite").format("noop").save()
    println("=== warmup done ===")
    for (parts <- Seq(0, 8, 16, 32); i <- 1 to 2) {
      spark.catalog.clearCache()
      val in = if (parts == 0) base else base.repartition(parts)
      val t0 = System.nanoTime()
      graft.llm.Repetition.signals(in, "doc_id", "text")
        .write.mode("overwrite").format("noop").save()
      println(f"=== parts=$parts run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ===")
    }
    spark.stop()
  }
}
