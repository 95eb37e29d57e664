package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main for the q49 bench entry (pair→group connected
  * components): times the pair-producer and the components stage
  * separately, bench-style (warmed, min of 2), so a wall-clock drift
  * can be attributed to data work vs per-round fixed job cost (the
  * r7 regression suspect — profiling showed the loop converges in
  * ONE round at sf0.1, so wall time is ~all fixed job overhead).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProfileQ49"
  */
object ProfileQ49 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(dir: String): Unit =
      graft.SparkEntry.queries("q49_dup_components")(spark, dir)
        .write.mode("overwrite").format("noop").save()

    // warm the plan at tiny scale, exactly like Bench
    try run("/root/testdata/sf0.001") catch { case _: Throwable => () }

    // pairs stage alone, min of 2
    val tPairs = Seq.fill(2) {
      spark.catalog.clearCache()
      time(graft.llm.Dedup.minHashVerifiedPairs(
          spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text", 3, 0.5)
        .write.mode("overwrite").format("noop").save())
    }.min
    println(f"[profile] pairs stage (min of 2)      $tPairs%.3f s")

    // components on PERSISTED pairs (isolates the loop's own cost)
    spark.catalog.clearCache()
    val pairs = graft.llm.Dedup.minHashVerifiedPairs(
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text", 3, 0.5)
      .persist()
    println(s"[profile] n_pairs=${pairs.count()}")
    val tComp = Seq.fill(2)(time(
      graft.llm.Dedup.components(pairs)
        .groupBy("comp_id").agg(count(lit(1)).as("n_docs"))
        .write.mode("overwrite").format("noop").save())).min
    println(f"[profile] components stage (min of 2) $tComp%.3f s")
    pairs.unpersist()

    // full bench entry, min of 2 with cache cleared — the BENCH number
    val tFull = Seq.fill(2) {
      spark.catalog.clearCache()
      time(run(sfDir))
    }.min
    println(f"[profile] q49 full (min of 2)         $tFull%.3f s")
    spark.stop()
  }
}
