package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch decomposition profiler for the optimization round: times
  * named sub-stages of the heavy bench entries so the expensive
  * leg is identified empirically (guide §1) instead of guessed.
  * `runMain graft.ProfileStages <sfDir> <what>`; prints one JSON
  * line of per-stage min-of-2 wall seconds. Not part of any declared
  * query; measurement-only. */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val what = if (args.length > 1) args(1) else "q353"
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
    def noop(df: DataFrame): Double = {
      spark.catalog.clearCache()
      time(df.write.mode("overwrite").format("noop").save())
    }
    def minOf2(mk: => DataFrame): Double = {
      val a = noop(mk); val b = noop(mk); math.min(a, b)
    }

    val stages: Seq[(String, () => Double)] = what match {
      case "q353" =>
        // replicate the q353 fixture pipeline piecewise
        import spark.implicits._
        def pay = SparkEntry.q353Fixture(spark, sfDir)
        def media = graft.sources.Multimodal.asMedia(pay, "doc_id", "warc", "warc")
        def rows = graft.sources.Warc.warcDocRows(media)
        Seq(
          "partitions" -> (() => {
            val p1 = pay.rdd.getNumPartitions
            val p2 = rows.rdd.getNumPartitions
            System.err.println(s"[profile] pay parts=$p1 rows parts=$p2")
            p1.toDouble
          }),
          "fixture_bytes" -> (() => minOf2(pay)),
          "full_q353_widened" -> (() => {
            def widenedQ353 = {
              val pay2 = SparkEntry.q353Fixture(spark, sfDir)
              val media = graft.sources.Multimodal.asMedia(pay2, "doc_id", "warc", "warc")
              val rows2 = graft.sources.Warc.warcDocRows(media)
                .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
              val pages = rows2.where(col("kind") === "page")
                .drop("kind", "status", "target")
              val edges = rows2.where(col("kind") === "redirect")
                .select(graft.functions.CanonicalUrl(col("url")).as("src"),
                  col("target").as("dst"))
              graft.llm.Curation.v16Batch(pages, edges,
                  Seq("bad.example", "spam.test"), domainCap = 7)
                .orderBy("media_id", "record_idx")
            }
            minOf2(widenedQ353)
          }),
          "doc_rows_nopersist" -> (() => minOf2(rows)),
          "full_q353" -> (() => minOf2(
            SparkEntry.queries("q353_curation_v16")(spark, sfDir))),
          "v16_from_cached_rows" -> (() => {
            // persist rows once OUTSIDE the timed region, then time
            // the v16 body alone (join + resolve + windows)
            spark.catalog.clearCache()
            val r = rows.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            r.count()
            val pages = r.where(col("kind") === "page")
              .drop("kind", "status", "target")
            val edges = r.where(col("kind") === "redirect")
              .select(graft.functions.CanonicalUrl(col("url")).as("src"),
                col("target").as("dst"))
            def body = graft.llm.Curation.v16Batch(pages, edges,
              Seq("bad.example", "spam.test"), domainCap = 7)
              .orderBy("media_id", "record_idx")
            val a = time(body.write.mode("overwrite").format("noop").save())
            val b = time(body.write.mode("overwrite").format("noop").save())
            r.unpersist()
            math.min(a, b)
          }),
          "gates_only_from_cached_rows" -> (() => {
            spark.catalog.clearCache()
            val r = rows.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            r.count()
            val pages = r.where(col("kind") === "page")
              .drop("kind", "status", "target")
            def body = graft.llm.Curation.v14Gates(pages,
              Seq("bad.example", "spam.test"))
            val a = time(body.write.mode("overwrite").format("noop").save())
            val b = time(body.write.mode("overwrite").format("noop").save())
            r.unpersist()
            math.min(a, b)
          }),
          "gates_join_from_cached_rows" -> (() => {
            spark.catalog.clearCache()
            val r = rows.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            r.count()
            val pages = r.where(col("kind") === "page")
              .drop("kind", "status", "target")
            val edges = r.where(col("kind") === "redirect")
              .select(graft.functions.CanonicalUrl(col("url")).as("src"),
                col("target").as("dst"))
            val resolved = graft.ops.Redirects
              .resolve(edges, "src", "dst", 8)
              .where(col("terminal"))
              .select(col("src").as("url_canon"), col("final_url"))
            def body = graft.llm.Curation.v14Gates(pages,
                Seq("bad.example", "spam.test"))
              .join(resolved, Seq("url_canon"), "left")
              .withColumn("url_canon",
                coalesce(col("final_url"), col("url_canon")))
              .drop("final_url")
            val a = time(body.write.mode("overwrite").format("noop").save())
            val b = time(body.write.mode("overwrite").format("noop").save())
            r.unpersist()
            math.min(a, b)
          }),
          "resolve_alone_from_cached_edges" -> (() => {
            spark.catalog.clearCache()
            val r = rows.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            r.count()
            val edges = r.where(col("kind") === "redirect")
              .select(graft.functions.CanonicalUrl(col("url")).as("src"),
                col("target").as("dst"))
            def body = graft.ops.Redirects.resolve(edges, "src", "dst", 8)
            val a = time(body.write.mode("overwrite").format("noop").save())
            val b = time(body.write.mode("overwrite").format("noop").save())
            r.unpersist()
            math.min(a, b)
          })
        )
      case _ => sys.error(s"unknown profile target: $what")
    }
    val results = stages.map { case (n, f) => n -> f() }
    def r3(x: Double) = math.round(x * 1000) / 1000.0
    println(results.map { case (n, s) => s""""$n":${r3(s)}""" }
      .mkString("{", ",", "}"))
    spark.stop()
  }
}
