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
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def time(f: => Unit): Double = {
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime(); f
      val w = (System.nanoTime() - t0) / 1e9
      val c = (osBean.getProcessCpuTime - c0) / 1e9
      System.err.println(f"[cpu] wall=$w%.3f cpu=$c%.3f")
      w
    }
    def noop(df: DataFrame): Double = {
      spark.catalog.clearCache()
      time(df.write.mode("overwrite").format("noop").save())
    }
    def minOf2(mk: => DataFrame): Double = {
      val a = noop(mk); val b = noop(mk); math.min(a, b)
    }
    // noop WITHOUT clearing the cache — for timing a leg downstream
    // of a deliberately persisted input
    def noopKeepCache(df: DataFrame): Double =
      time(df.write.mode("overwrite").format("noop").save())

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
          }),
          "resolve_cut_variant" -> (() => {
            // r20: same pointer-doubled set-bit resolve, but each jump
            // level localCheckpoint-cut so nested broadcast builds
            // stop recomputing lower levels
            spark.catalog.clearCache()
            val r = rows.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            r.count()
            val edgesIn = r.where(col("kind") === "redirect")
              .select(graft.functions.CanonicalUrl(col("url")).as("src"),
                col("target").as("dst"))
            def cut(df: org.apache.spark.sql.DataFrame) = {
              val rdd = df.rdd.localCheckpoint()
              rdd.count()
              spark.createDataFrame(rdd, df.schema)
            }
            def body = {
              val maxHops = 8
              val edges = cut(edgesIn
                .select(col("src").as("__s"), col("dst").as("__d"))
                .where(col("__s").isNotNull && col("__d").isNotNull &&
                  col("__s") =!= col("__d"))
                .groupBy("__s").agg(min("__d").as("__d")))
              var levels = List((edges.select(col("__s").as("u"),
                col("__d").as("v"), lit(1).as("len")), 1))
              var span = 1
              while (span * 2 <= maxHops) {
                val j = levels.head._1
                val right = j.select(col("u").as("v"), col("v").as("__v2"),
                  col("len").as("__len2"))
                val nxt = j.join(right, Seq("v"), "left")
                  .select(col("u"),
                    coalesce(col("__v2"), col("v")).as("v"),
                    (col("len") + coalesce(col("__len2"), lit(0))).as("len"))
                levels ::= ((if (span * 2 * 2 <= maxHops) cut(nxt) else nxt),
                  span * 2)
                span *= 2
              }
              var cur: org.apache.spark.sql.DataFrame = null
              var remaining = maxHops
              levels.foreach { case (j, s) =>
                if (s <= remaining) {
                  remaining -= s
                  cur =
                    if (cur == null)
                      j.select(col("u").as("src"), col("v").as("cur"),
                        col("len").as("hops"))
                    else {
                      val right = j.select(col("u").as("cur"), col("v").as("__v2"),
                        col("len").as("__len2"))
                      cur.join(right, Seq("cur"), "left")
                        .select(col("src"),
                          coalesce(col("__v2"), col("cur")).as("cur"),
                          (col("hops") + coalesce(col("__len2"), lit(0))).as("hops"))
                    }
                }
              }
              val outgoing = edges.select(col("__s").as("cur"),
                lit(true).as("__has_out"))
              cur.join(outgoing, Seq("cur"), "left")
                .select(col("src"), col("cur").as("final_url"),
                  col("hops").cast("long").as("hops"),
                  coalesce(!col("__has_out"), lit(true)).as("terminal"))
            }
            val a = time(body.write.mode("overwrite").format("noop").save())
            val b = time(body.write.mode("overwrite").format("noop").save())
            r.unpersist()
            math.min(a, b)
          })
        )
      case "q150" =>
        import org.apache.spark.sql.functions._
        def docsX10 = spark.read.parquet(s"$sfDir/documents.parquet")
          .crossJoin(spark.range(10).select(col("id").as("rep")))
          .select((col("doc_id") * 10 + col("rep")).as("doc_id"),
            TagWords(col("text"), col("rep")).as("text"))
          .repartition(32)
        import graft.functions.{SketchExpressions => SE}
        def toksDf = graft.core.Engine.widen(docsX10)
          .select(col("doc_id").as("id"),
            explode(SE.shingleHashes64(col("text"), 3)).as("tok"))
        def oldJaccard = {
          import graft.functions.{SketchExpressions => SE}
          val toks = toksDf.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          toks.count()
          val dfc = toks.groupBy("tok").agg(count(lit(1)).as("dfc"))
          val docs = toks.join(dfc, "tok")
            .groupBy("id")
            .agg(sort_array(collect_list(struct(col("dfc"), col("tok")))).as("arr"),
              count(lit(1)).as("n"))
          val prefixLen = expr(s"CAST(n - ((n * 1 + 1) DIV 2) + 1 AS INT)")
          val prefix = docs
            .select(col("id"), col("n"),
              posexplode(slice(col("arr").getField("tok"), lit(1), prefixLen))
                .as(Seq("p0", "tok")))
            .select(col("id"), col("n"), (col("p0") + 1).as("p"), col("tok"))
          val a = prefix.select(col("id").as("id1"), col("n").as("n1"),
            col("p").as("pa"), col("tok"))
          val b = prefix.select(col("id").as("id2"), col("n").as("n2"),
            col("p").as("pb"), col("tok"))
          val cands = a.join(b, Seq("tok"))
            .where(col("id1") < col("id2") &&
              col("n1") * 1 <= col("n2") * 2 &&
              col("n2") * 1 <= col("n1") * 2 &&
              (least(col("n1") - col("pa"), col("n2") - col("pb")) + 1) * 3
                >= (col("n1") + col("n2")) * 1)
            .select(col("id1"), col("n1"), col("id2"), col("n2"))
            .distinct()
          val blobs = toks.groupBy("id")
            .agg(SE.packLongs(sort_array(collect_list(col("tok")))).as("blob"))
          cands
            .join(blobs.select(col("id").as("id1"), col("blob").as("b1")), "id1")
            .join(blobs.select(col("id").as("id2"), col("blob").as("b2")), "id2")
            .withColumn("inter", SE.packedIntersectCount(col("b1"), col("b2")).cast("long"))
            .where(col("inter") * 2 >= (col("n1") + col("n2") - col("inter")) * 1)
            .select(col("id1"), col("id2"), col("inter"), col("n1"), col("n2"))
        }
        def newJaccard = graft.llm.SetSimJoin.jaccardPairs(
            docsX10, "doc_id", "text", 1, 2, ngram = 3)
          .select(col("id1"), col("id2"), col("inter"), col("n1"), col("n2"))
        Seq(
          "docsx10" -> (() => minOf2(docsX10)),
          "toks" -> (() => minOf2(toksDf)),
          "full_new_1" -> (() => noop(newJaccard)),
          "full_old_1" -> (() => noop(oldJaccard)),
          "full_new_2" -> (() => noop(newJaccard)),
          "full_old_2" -> (() => noop(oldJaccard)),
          "full_new_3" -> (() => noop(newJaccard)),
          "full_old_3" -> (() => noop(oldJaccard)),
          "full_new_4" -> (() => noop(newJaccard)),
          "full_old_4" -> (() => noop(oldJaccard)),
          "full_new_5" -> (() => noop(newJaccard)),
          "full_old_5" -> (() => noop(oldJaccard)),
          "cands_from_cached_toks" -> (() => {
            spark.catalog.clearCache()
            val t = toksDf.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            t.count()
            val dfc = t.groupBy("tok").agg(count(lit(1)).as("dfc"))
            val docs = t.join(dfc, "tok")
              .groupBy("id")
              .agg(sort_array(collect_list(struct(col("dfc"), col("tok")))).as("arr"),
                count(lit(1)).as("n"))
            val prefixLen = expr(s"CAST(n - ((n * 1 + 1) DIV 2) + 1 AS INT)")
            val prefix = docs
              .select(col("id"), col("n"),
                posexplode(slice(col("arr").getField("tok"), lit(1), prefixLen))
                  .as(Seq("p0", "tok")))
              .select(col("id"), col("n"), (col("p0") + 1).as("p"), col("tok"))
            val a = prefix.select(col("id").as("id1"), col("n").as("n1"),
              col("p").as("pa"), col("tok"))
            val b = prefix.select(col("id").as("id2"), col("n").as("n2"),
              col("p").as("pb"), col("tok"))
            def cands = a.join(b, Seq("tok"))
              .where(col("id1") < col("id2") &&
                col("n1") * 1 <= col("n2") * 2 &&
                col("n2") * 1 <= col("n1") * 2 &&
                (least(col("n1") - col("pa"), col("n2") - col("pb")) + 1) * 3
                  >= (col("n1") + col("n2")) * 1)
              .select(col("id1"), col("n1"), col("id2"), col("n2"))
              .distinct()
            val x = time(cands.write.mode("overwrite").format("noop").save())
            val y = time(cands.write.mode("overwrite").format("noop").save())
            t.unpersist()
            math.min(x, y)
          }),
          "docsagg_from_cached_toks" -> (() => {
            spark.catalog.clearCache()
            val t = toksDf.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            t.count()
            val dfc = t.groupBy("tok").agg(count(lit(1)).as("dfc"))
            def docs = t.join(dfc, "tok")
              .groupBy("id")
              .agg(sort_array(collect_list(struct(col("dfc"), col("tok")))).as("arr"),
                count(lit(1)).as("n"))
            val x = time(docs.write.mode("overwrite").format("noop").save())
            val y = time(docs.write.mode("overwrite").format("noop").save())
            t.unpersist()
            math.min(x, y)
          }),
          "dfc_from_cached_toks" -> (() => {
            spark.catalog.clearCache()
            val t = toksDf.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            t.count()
            def dfc = t.groupBy("tok").agg(count(lit(1)).as("dfc"))
            val x = time(dfc.write.mode("overwrite").format("noop").save())
            val y = time(dfc.write.mode("overwrite").format("noop").save())
            t.unpersist()
            math.min(x, y)
          }),
          "blobs_from_cached_toks" -> (() => {
            spark.catalog.clearCache()
            val t = toksDf.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            t.count()
            def blobs = t.groupBy("id")
              .agg(SE.packLongs(sort_array(collect_list(col("tok")))).as("blob"))
            val x = time(blobs.write.mode("overwrite").format("noop").save())
            val y = time(blobs.write.mode("overwrite").format("noop").save())
            t.unpersist()
            math.min(x, y)
          })
        )
      case "q150v" =>
        // candidate-stage variant A/B for the r20 SetSimJoin work:
        // cardinalities first (how big is each leg), then timed
        // variants of the candidate pipeline from cached toks.
        import org.apache.spark.sql.functions._
        import graft.functions.{SketchExpressions => SE}
        def docsX10v = spark.read.parquet(s"$sfDir/documents.parquet")
          .crossJoin(spark.range(10).select(col("id").as("rep")))
          .select((col("doc_id") * 10 + col("rep")).as("doc_id"),
            TagWords(col("text"), col("rep")).as("text"))
          .repartition(32)
        def toksDfv = graft.core.Engine.widen(docsX10v)
          .select(col("doc_id").as("id"),
            explode(SE.shingleHashes64(col("text"), 3)).as("tok"))
        val num = 1; val den = 2
        def withToks[T](f: org.apache.spark.sql.DataFrame => T): T = {
          spark.catalog.clearCache()
          val t = toksDfv.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          t.count()
          val r = f(t)
          t.unpersist()
          r
        }
        def prefixOf(docs: org.apache.spark.sql.DataFrame) = {
          val prefixLen = expr(s"CAST(n - ((n * $num + ${den - 1}) DIV $den) + 1 AS INT)")
          docs.select(col("id"), col("n"),
              posexplode(slice(col("arr").getField("tok"), lit(1), prefixLen))
                .as(Seq("p0", "tok")))
            .select(col("id"), col("n"), (col("p0") + 1).as("p"), col("tok"))
        }
        def selfJoin(prefix: org.apache.spark.sql.DataFrame,
                     shj: Boolean) = {
          val a = prefix.select(col("id").as("id1"), col("n").as("n1"),
            col("p").as("pa"), col("tok"))
          val b0 = prefix.select(col("id").as("id2"), col("n").as("n2"),
            col("p").as("pb"), col("tok"))
          val b = if (shj) b0.hint("SHUFFLE_HASH") else b0
          a.join(b, Seq("tok"))
            .where(col("id1") < col("id2") &&
              col("n1") * num <= col("n2") * den &&
              col("n2") * num <= col("n1") * den &&
              (least(col("n1") - col("pa"), col("n2") - col("pb")) + 1) * (num + den)
                >= (col("n1") + col("n2")) * num)
            .select(col("id1"), col("n1"), col("id2"), col("n2"))
            .distinct()
        }
        def docsCur(t: org.apache.spark.sql.DataFrame, shj: Boolean) = {
          val dfc0 = t.groupBy("tok").agg(count(lit(1)).as("dfc"))
          val dfc = if (shj) dfc0.hint("SHUFFLE_HASH") else dfc0
          t.join(dfc, "tok")
            .groupBy("id")
            .agg(sort_array(collect_list(struct(col("dfc"), col("tok")))).as("arr"),
              count(lit(1)).as("n"))
        }
        def docsNoJoin(t: org.apache.spark.sql.DataFrame) =
          t.groupBy("tok").agg(collect_list(col("id")).as("ids"))
            .select(size(col("ids")).cast("long").as("dfc"), col("tok"),
              explode(col("ids")).as("id"))
            .groupBy("id")
            .agg(sort_array(collect_list(struct(col("dfc"), col("tok")))).as("arr"),
              count(lit(1)).as("n"))
        // PPJoin accumulated-overlap candidate filter: aggregate the
        // join output per pair instead of distinct() — c shared
        // prefix tokens with last-match positions (max pa, max pb)
        // bound the total overlap at c + min(n1-pa*, n2-pb*); the
        // first-match positions (min pa, min pb) bound it at
        // 1 + min(n1-pa1, n2-pb1). Both complete (see r20 notes).
        def selfJoinAgg(prefix: org.apache.spark.sql.DataFrame) = {
          val a = prefix.select(col("id").as("id1"), col("n").as("n1"),
            col("p").as("pa"), col("tok"))
          val b = prefix.select(col("id").as("id2"), col("n").as("n2"),
            col("p").as("pb"), col("tok"))
          a.join(b, Seq("tok"))
            .where(col("id1") < col("id2") &&
              col("n1") * num <= col("n2") * den &&
              col("n2") * num <= col("n1") * den)
            .groupBy("id1", "id2", "n1", "n2")
            .agg(count(lit(1)).as("c"),
              max(col("pa")).as("pam"), max(col("pb")).as("pbm"),
              min(col("pa")).as("pa1"), min(col("pb")).as("pb1"))
            .where(
              (col("c") + least(col("n1") - col("pam"), col("n2") - col("pbm")))
                * (num + den) >= (col("n1") + col("n2")) * num &&
              (least(col("n1") - col("pa1"), col("n2") - col("pb1")) + 1)
                * (num + den) >= (col("n1") + col("n2")) * num)
            .select(col("id1"), col("n1"), col("id2"), col("n2"))
        }
        // the committed (new) candidate pipeline, via a copy of the
        // asymmetric indexing-prefix form, to count its candidates
        def selfJoinAsym(prefix: org.apache.spark.sql.DataFrame) = {
          val a = prefix.select(col("id").as("ida"), col("n").as("na"),
            col("p").as("pa"), col("tok"))
          val ixLen = expr(
            s"n - ((2 * $num * n + ${num + den - 1}) DIV ${num + den}) + 1")
          val b = prefix.where(col("p") <= ixLen)
            .select(col("id").as("idb"), col("n").as("nb"),
              col("p").as("pb"), col("tok"))
          a.join(b.hint("SHUFFLE_HASH"), Seq("tok"))
            .where((col("nb") < col("na") ||
                (col("nb") === col("na") && col("idb") < col("ida"))) &&
              col("na") * num <= col("nb") * den)
            .groupBy("ida", "idb", "na", "nb")
            .agg(count(lit(1)).as("c"),
              max(col("pa")).as("pam"), max(col("pb")).as("pbm"),
              min(col("pa")).as("pa1"), min(col("pb")).as("pb1"))
            .where(
              (col("c") + least(col("na") - col("pam"), col("nb") - col("pbm")))
                * (num + den) >= (col("na") + col("nb")) * num &&
              (least(col("na") - col("pa1"), col("nb") - col("pb1")) + 1)
                * (num + den) >= (col("na") + col("nb")) * num)
            .select(least(col("ida"), col("idb")).as("id1"),
              greatest(col("ida"), col("idb")).as("id2"))
        }
        Seq(
          "counts" -> (() => withToks { t =>
            val nPost = t.count()
            val prefix = prefixOf(docsCur(t, shj = false))
            val nCand = selfJoin(prefix, shj = false).count()
            val nCandAsym = selfJoinAsym(prefix).count()
            System.err.println(s"[q150v] postings=$nPost " +
              s"candsOld=$nCand candsAsym=$nCandAsym")
            nPost.toDouble
          }),
          "cands_agg" -> (() => withToks { t =>
            def c = selfJoinAgg(prefixOf(docsCur(t, shj = false)))
            val x = noopKeepCache(c); val y = noopKeepCache(c); math.min(x, y)
          }),
          "full_agg_variant" -> (() => withToks { t =>
            import graft.functions.{SketchExpressions => SE2}
            def full = {
              val cands = selfJoinAgg(prefixOf(docsCur(t, shj = false)))
              val blobs = t.groupBy("id")
                .agg(SE2.packLongs(sort_array(collect_list(col("tok")))).as("blob"))
              cands
                .join(blobs.select(col("id").as("id1"), col("blob").as("b1")), "id1")
                .join(blobs.select(col("id").as("id2"), col("blob").as("b2")), "id2")
                .withColumn("inter", SE2.packedIntersectCount(col("b1"), col("b2")).cast("long"))
                .where(col("inter") * den >= (col("n1") + col("n2") - col("inter")) * num)
                .select(col("id1"), col("id2"), col("inter"), col("n1"), col("n2"))
            }
            val x = noopKeepCache(full); val y = noopKeepCache(full); math.min(x, y)
          }),
          "full_cur_variant" -> (() => withToks { t =>
            import graft.functions.{SketchExpressions => SE2}
            def full = {
              val cands = selfJoin(prefixOf(docsCur(t, shj = false)), shj = false)
              val blobs = t.groupBy("id")
                .agg(SE2.packLongs(sort_array(collect_list(col("tok")))).as("blob"))
              cands
                .join(blobs.select(col("id").as("id1"), col("blob").as("b1")), "id1")
                .join(blobs.select(col("id").as("id2"), col("blob").as("b2")), "id2")
                .withColumn("inter", SE2.packedIntersectCount(col("b1"), col("b2")).cast("long"))
                .where(col("inter") * den >= (col("n1") + col("n2") - col("inter")) * num)
                .select(col("id1"), col("id2"), col("inter"), col("n1"), col("n2"))
            }
            val x = noopKeepCache(full); val y = noopKeepCache(full); math.min(x, y)
          }),
          "cands_cur" -> (() => withToks { t =>
            def c = selfJoin(prefixOf(docsCur(t, shj = false)), shj = false)
            val x = noopKeepCache(c); val y = noopKeepCache(c); math.min(x, y)
          }),
          "cands_shj" -> (() => withToks { t =>
            def c = selfJoin(prefixOf(docsCur(t, shj = true)), shj = true)
            val x = noopKeepCache(c); val y = noopKeepCache(c); math.min(x, y)
          }),
          "cands_nojoin" -> (() => withToks { t =>
            def c = selfJoin(prefixOf(docsNoJoin(t)), shj = false)
            val x = noopKeepCache(c); val y = noopKeepCache(c); math.min(x, y)
          }),
          "cands_nojoin_shjpair" -> (() => withToks { t =>
            def c = selfJoin(prefixOf(docsNoJoin(t)), shj = true)
            val x = noopKeepCache(c); val y = noopKeepCache(c); math.min(x, y)
          }),
          "docs_cur" -> (() => withToks { t =>
            def c = docsCur(t, shj = false)
            val x = noopKeepCache(c); val y = noopKeepCache(c); math.min(x, y)
          }),
          "docs_shj" -> (() => withToks { t =>
            def c = docsCur(t, shj = true)
            val x = noopKeepCache(c); val y = noopKeepCache(c); math.min(x, y)
          }),
          "docs_nojoin" -> (() => withToks { t =>
            def c = docsNoJoin(t)
            val x = noopKeepCache(c); val y = noopKeepCache(c); math.min(x, y)
          })
        )
      case "sketch" =>
        // r20 session 2: the MinHash sketch pass A/B — the old
        // two-expression form (tokenize+FNV twice per row) vs the
        // fused one-pass MinHashSketch, on the x10 corpus the q27/q49
        // x10 entries sketch. old/fused time the map pass alone;
        // q27_x10 is the whole verified-pairs chain (bench shape,
        // construction inside the timed region).
        import graft.functions.{SketchExpressions => SE}
        def docsX10Fix = spark.read.parquet(s"$sfDir/documents.parquet")
          .crossJoin(spark.range(10).select(col("id").as("rep")))
          .select((col("doc_id") * 10 + col("rep")).as("doc_id"),
            TagWords(col("text"), col("rep")).as("text"))
          .repartition(32)
        def oldSketch = docsX10Fix.select(col("doc_id"),
          SE.packLongs(graft.llm.Dedup.minHashSignature(col("text"), 3)).as("sigb"),
          SE.packLongs(SE.shingleHashes64(col("text"), 3)).as("shhb"))
        def fusedSketch =
          graft.llm.Dedup.sketchFrame(docsX10Fix, "doc_id", "text", 3)
        def chain(): Double = {
          spark.catalog.clearCache()
          time(graft.llm.Dedup.minHashVerifiedPairs(
              docsX10Fix, "doc_id", "text", 3, 0.5)
            .write.mode("overwrite").format("noop").save())
        }
        Seq(
          "old_two_pass_a" -> (() => minOf2(oldSketch)),
          "fused_a" -> (() => minOf2(fusedSketch)),
          "old_two_pass_b" -> (() => minOf2(oldSketch)),
          "fused_b" -> (() => minOf2(fusedSketch)),
          "q27_x10_chain_a" -> (() => { val a = chain(); val b = chain(); math.min(a, b) }),
          "q27_x10_chain_b" -> (() => { val a = chain(); val b = chain(); math.min(a, b) })
        )
      case "dedup27" =>
        // Decompose q27_x10's ~42 cpu-s: sketch pass, band table,
        // candidate pairs, attach+verify — each leg from the cached
        // predecessor so the deltas are attributable.
        import graft.functions.{SketchExpressions => SE}
        def docsX10Fix = spark.read.parquet(s"$sfDir/documents.parquet")
          .crossJoin(spark.range(10).select(col("id").as("rep")))
          .select((col("doc_id") * 10 + col("rep")).as("doc_id"),
            TagWords(col("text"), col("rep")).as("text"))
          .repartition(32)
        def withCachedSketch[T](f: (DataFrame, DataFrame) => T): T = {
          spark.catalog.clearCache()
          val sk = graft.llm.Dedup.sketchFrame(docsX10Fix, "doc_id", "text", 3)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          sk.count()
          val base = sk.where(length(col("shhb")) > 0)
          val banded = base.select(col("doc_id"),
              posexplode(SE.bandKeys(col("sigb"), 32, 2)))
            .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          banded.count()
          val r = f(base, banded)
          sk.unpersist(); banded.unpersist(); r
        }
        Seq(
          "fixture_only" -> (() => minOf2(
            docsX10Fix.select(sum(length(col("text"))).as("n")))),
          "sketch_pass" -> (() => minOf2(
            graft.llm.Dedup.sketchFrame(docsX10Fix, "doc_id", "text", 3))),
          "cand_from_cached" -> (() => withCachedSketch { (_, banded) =>
            def cand = graft.llm.Dedup.bandedPairsForProfile(banded)
            val a = noopKeepCache(cand); val b = noopKeepCache(cand)
            System.err.println(s"[profile] candidates=${cand.count()}")
            math.min(a, b)
          }),
          "verify_from_cached" -> (() => withCachedSketch { (base, banded) =>
            def full = {
              val cand = graft.llm.Dedup.bandedPairsForProfile(banded)
              cand
                .join(base.select(col("doc_id").as("id1"), col("sigb").as("sig1"), col("shhb").as("sh1")), "id1")
                .join(base.select(col("doc_id").as("id2"), col("sigb").as("sig2"), col("shhb").as("sh2")), "id2")
                .withColumn("est", SE.sigAgreeCount(col("sig1"), col("sig2"))
                  .cast("double") / lit(64.0))
                .where(col("est") >= 0.2)
                .withColumn("inter", SE.packedIntersectCount(col("sh1"), col("sh2")))
                .withColumn("jaccard", col("inter").cast("double") /
                  ((length(col("sh1")) + length(col("sh2"))) / 8 - col("inter")))
                .where(col("jaccard") >= 0.5)
            }
            val a = noopKeepCache(full); val b = noopKeepCache(full)
            math.min(a, b)
          })
        )
      case "dedup27b" =>
        // Finer split of the q27_x10 candidate stage: hot-bucket agg,
        // fenced self-join pre-dedup, the dedup, and the attach joins.
        import graft.functions.{SketchExpressions => SE}
        def docsX10Fix = spark.read.parquet(s"$sfDir/documents.parquet")
          .crossJoin(spark.range(10).select(col("id").as("rep")))
          .select((col("doc_id") * 10 + col("rep")).as("doc_id"),
            TagWords(col("text"), col("rep")).as("text"))
          .repartition(32)
        def withCachedBands[T](f: (DataFrame, DataFrame) => T): T = {
          spark.catalog.clearCache()
          val sk = graft.llm.Dedup.sketchFrame(docsX10Fix, "doc_id", "text", 3)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          sk.count()
          val base = sk.where(length(col("shhb")) > 0)
          val banded = base.select(col("doc_id"),
              posexplode(SE.bandKeys(col("sigb"), 32, 2)))
            .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          banded.count()
          val r = f(base, banded)
          sk.unpersist(); banded.unpersist(); r
        }
        Seq(
          "hotbuckets_agg" -> (() => withCachedBands { (_, banded) =>
            def hb = graft.llm.Dedup.hotBuckets(banded, Seq("band", "bkey"), 100000)
            val a = noopKeepCache(hb); val b = noopKeepCache(hb); math.min(a, b)
          }),
          "selfjoin_nodedup" -> (() => withCachedBands { (_, banded) =>
            def kept = graft.llm.Dedup.fenceHotBuckets(banded, Seq("band", "bkey"), 100000)
            def j = kept.alias("a").join(kept.alias("b"),
                col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
                  col("a.doc_id") < col("b.doc_id"))
              .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
            val a = noopKeepCache(j); val b = noopKeepCache(j)
            System.err.println(s"[profile] prejoin_pairs=${j.count()}")
            math.min(a, b)
          }),
          "selfjoin_dedup" -> (() => withCachedBands { (_, banded) =>
            def cand = graft.llm.Dedup.bandedPairsForProfile(banded)
            val a = noopKeepCache(cand); val b = noopKeepCache(cand); math.min(a, b)
          }),
          "attach_only" -> (() => withCachedBands { (base, banded) =>
            val cand = graft.llm.Dedup.bandedPairsForProfile(banded)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            cand.count()
            def att = cand
              .join(base.select(col("doc_id").as("id1"), col("sigb").as("sig1"), col("shhb").as("sh1")), "id1")
              .join(base.select(col("doc_id").as("id2"), col("sigb").as("sig2"), col("shhb").as("sh2")), "id2")
              .withColumn("est", SE.sigAgreeCount(col("sig1"), col("sig2"))
                .cast("double") / lit(64.0))
              .where(col("est") >= 0.2)
              .withColumn("inter", SE.packedIntersectCount(col("sh1"), col("sh2")))
              .select(col("id1"), col("id2"), col("inter"))
            val a = noopKeepCache(att); val b = noopKeepCache(att)
            cand.unpersist(); math.min(a, b)
          })
        )
      case "dedup27c" =>
        // A/B: AQE SMJ→SHJ conversion for the dedup chain (guide
        // §3.1 — hash join skips the two 16M-row sorts of the band
        // self-join and the blob sort of the attach joins).
        def chainOnce(): Double = {
          spark.catalog.clearCache()
          time(graft.llm.Dedup.minHashVerifiedPairs(
              spark.read.parquet(s"$sfDir/documents.parquet")
                .crossJoin(spark.range(10).select(col("id").as("rep")))
                .select((col("doc_id") * 10 + col("rep")).as("doc_id"),
                  TagWords(col("text"), col("rep")).as("text"))
                .repartition(32), "doc_id", "text", 3, 0.5)
            .write.mode("overwrite").format("noop").save())
        }
        def withConf(v: String)(f: => Double): Double = {
          spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", v)
          try f finally spark.conf.set(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "0")
        }
        Seq(
          "smj_a" -> (() => { val a = chainOnce(); val b = chainOnce(); math.min(a, b) }),
          "shj_a" -> (() => withConf("256m") {
            val a = chainOnce(); val b = chainOnce(); math.min(a, b) }),
          "smj_b" -> (() => { val a = chainOnce(); val b = chainOnce(); math.min(a, b) }),
          "shj_b" -> (() => withConf("256m") {
            val a = chainOnce(); val b = chainOnce(); math.min(a, b) })
        )
      case "q266nd" =>
        // q266 near-dup leg forensics: chunk-row volume, bucket-size
        // histogram, pre-gate candidate count — is the 18 cpu-s leg
        // enumeration-bound, and from which buckets?
        Seq("forensics" -> (() => {
          spark.catalog.clearCache()
          val h = graft.sources.Multimodal.describeVideoHashes(
            graft.sources.Multimodal.asMedia(
              SparkEntry.q266VidPayProbe(spark, sfDir), "doc_id", "vid", "video"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          h.count()
          val hashed = h.where(col("dhash").isNotNull)
            .select(col("media_id").cast("long").as("vid"),
              col("frame_idx").cast("int").as("fi"), col("dhash").as("vh"))
          System.err.println(s"[profile] frame_rows=${hashed.count()}")
          val chunks = hashed.select(col("vid"), col("fi"), col("vh"),
              graft.sources.Multimodal.chunk16ExplodeForProfile("vh").as("c"))
            .select(col("vid"), col("fi"), col("c.ci"), col("c.cv"))
          System.err.println(s"[profile] chunk_rows=${chunks.count()}")
          val buckets = chunks.groupBy("fi", "ci", "cv").count()
          val hist = buckets.groupBy(col("count").as("sz")).agg(count(lit(1)).as("n"))
            .orderBy(col("sz").desc).limit(12).collect()
          hist.foreach(r => System.err.println(s"[profile] bucket_sz=${r.get(0)} n=${r.get(1)}"))
          val pairs = buckets.select((col("count") * (col("count") - 1) / 2).as("pp"))
            .agg(sum("pp")).head.get(0)
          System.err.println(s"[profile] enumerated_pairs=$pairs")
          // sub-legs of videoNearDupPairs, all from the cached hashes
          val counts = hashed.groupBy(col("vid")).agg(count(lit(1)).as("nf"))
          val chunkT = hashed.select(col("vid"), col("fi"),
              col("vh"), graft.sources.Multimodal.chunk16ExplodeForProfile("vh").as("c"))
            .select(col("vid"), col("fi"), col("vh"), col("c.ci"), col("c.cv"))
          val fenced = graft.llm.Dedup.fenceHotBuckets(chunkT, Seq("fi", "ci", "cv"), 100000)
          def framePairs = fenced.alias("a")
            .join(fenced.alias("b"),
              col("a.fi") === col("b.fi") && col("a.ci") === col("b.ci") &&
                col("a.cv") === col("b.cv") && col("a.vid") < col("b.vid"))
            .select(col("a.vid").as("id1"), col("b.vid").as("id2"),
              col("a.fi").as("fi"),
              bit_count(col("a.vh").bitwiseXOR(col("b.vh"))).as("hamming"))
            .where(col("hamming") <= 3)
          System.err.println("[profile] joinleg (fence+join+gate, no dedup):")
          val t1 = math.min(noopKeepCache(framePairs), noopKeepCache(framePairs))
          System.err.println(s"[profile] joinleg_min=$t1 framePairs=${framePairs.count()}")
          def deduped = framePairs.dropDuplicates("id1", "id2", "fi")
          System.err.println("[profile] dedupleg:")
          val t2 = math.min(noopKeepCache(deduped), noopKeepCache(deduped))
          def full = graft.sources.Multimodal.videoNearDupPairs(h, 3)
          System.err.println("[profile] fullleg:")
          val t3 = math.min(noopKeepCache(full), noopKeepCache(full))
          System.err.println(s"[profile] joinleg=$t1 dedupleg=$t2 full=$t3")
          System.err.println("[profile] PLAN:\n" + framePairs.queryExecution
            .executedPlan.toString.linesIterator.take(40).mkString("\n"))
          h.unpersist(); 0.0
        }))
      case "q150legs" =>
        // Committed-shape leg split of q150_x10: token pass, the
        // docsRarity double aggregate, candidates-from-docs, full.
        import graft.functions.{SketchExpressions => SE}
        def docsX10L = spark.read.parquet(s"$sfDir/documents.parquet")
          .crossJoin(spark.range(10).select(col("id").as("rep")))
          .select((col("doc_id") * 10 + col("rep")).as("doc_id"),
            TagWords(col("text"), col("rep")).as("text"))
          .repartition(32)
        def toksL = graft.core.Engine.widen(docsX10L)
          .select(col("doc_id").as("id"),
            explode(SE.shingleHashes64(col("text"), 3)).as("tok"))
        Seq(
          "tok_pass" -> (() => minOf2( // shiftright: ANSI-safe sum
            toksL.select(sum(shiftright(col("tok"), 32)).as("s")))),
          "docs_rarity" -> (() => minOf2(
            graft.llm.SetSimJoin.docsRarityForProfile(toksL)
              .select(sum(col("n")).as("s")))),
          "cands_from_docs" -> (() => {
            spark.catalog.clearCache()
            val docs = graft.llm.SetSimJoin.docsRarityForProfile(toksL)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            docs.count()
            def cand = graft.llm.SetSimJoin.candidatesForProfile(docs, 1, 2)
            val a = noopKeepCache(cand); val b = noopKeepCache(cand)
            System.err.println(s"[profile] cands=${cand.count()}")
            docs.unpersist(); math.min(a, b)
          }),
          "full_q150_x10" -> (() => {
            def full = graft.llm.SetSimJoin.jaccardPairs(
              docsX10L, "doc_id", "text", 1, 2, ngram = 3)
            val a = noop(full); val b = noop(full); math.min(a, b)
          })
        )
      case "q226ck" =>
        // q226 checkpoint cadence A/B, BENCH-style: construction (the
        // eager round jobs) INSIDE the timed region, cache cleared
        // before each rep — QueryTime leaves construction untimed,
        // which hid the uncut DAG's recompute blowup (r20 final bench
        // caught it: wall 3.21→3.69, cpu 5.4→13.5).
        def kmRun(ck: Int): Double = {
          spark.catalog.clearCache()
          time {
            val r = graft.llm.Clustering.iterateSteps(
              graft.core.Tables.embeddings(spark, sfDir)
                .select(col("vec_id"), col("embedding"), col("label")),
              "vec_id", "embedding", "label", rounds = 3, dim = 64,
              scale = 1000, checkpointEvery = ck)
            r.release()
            r.assign.groupBy(col("label").as("cluster"))
              .agg(count(lit(1)).as("n"), sum("vec_id").as("id_sum"))
              .orderBy("cluster")
              .write.mode("overwrite").format("noop").save()
          }
        }
        Seq(
          "ck1_a" -> (() => kmRun(1)), "ck1_b" -> (() => kmRun(1)),
          "ck2_a" -> (() => kmRun(2)), "ck2_b" -> (() => kmRun(2)),
          "ck3_a" -> (() => kmRun(3)), "ck3_b" -> (() => kmRun(3)),
          "ck1_c" -> (() => kmRun(1)), "ck2_c" -> (() => kmRun(2)),
          "ck3_c" -> (() => kmRun(3))
        )
      case "q266" =>
        // r20 item 3: how much of q266 is AVI fixture synthesis vs
        // decode+pipeline. vid_synth replicates the vidPay leg alone
        // (through a byte-length sum so the noop sink can't skip the
        // synthesis); full_q266 is the declared entry as committed.
        import spark.implicits._
        def vidSynth = SparkEntry.q266VidPayProbe(spark, sfDir)
          .select(sum(length(col("vid"))).as("n"))
        Seq(
          "vid_synth" -> (() => minOf2(vidSynth)),
          "full_q266" -> (() => minOf2(
            SparkEntry.queries("q266_curation_v6")(spark, sfDir))),
          "hashes_only" -> (() => {
            spark.catalog.clearCache()
            def vidPay = SparkEntry.q266VidPayProbe(spark, sfDir)
            def h = graft.sources.Multimodal.describeVideoHashes(
              graft.sources.Multimodal.asMedia(vidPay, "doc_id", "vid", "video"))
            minOf2(h)
          }),
          "neardup_from_cached_hashes" -> (() => {
            spark.catalog.clearCache()
            val h = graft.sources.Multimodal.describeVideoHashes(
              graft.sources.Multimodal.asMedia(
                SparkEntry.q266VidPayProbe(spark, sfDir), "doc_id", "vid", "video"))
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            h.count()
            def nd = graft.sources.Multimodal.videoNearDupPairs(h, 3)
            val a = noopKeepCache(nd); val b = noopKeepCache(nd)
            h.unpersist(); math.min(a, b)
          }),
          "scenes_from_cached_hashes" -> (() => {
            spark.catalog.clearCache()
            val h = graft.sources.Multimodal.describeVideoHashes(
              graft.sources.Multimodal.asMedia(
                SparkEntry.q266VidPayProbe(spark, sfDir), "doc_id", "vid", "video"))
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            h.count()
            def sc = graft.sources.Multimodal.sceneCuts(h, 10)
            val a = noopKeepCache(sc); val b = noopKeepCache(sc)
            h.unpersist(); math.min(a, b)
          })
        )
      case "cacherace" =>
        // r20 Verify-concurrency diagnosis: does a concurrent
        // clearCache make the q49 components pipeline evaluate EMPTY?
        Seq("race" -> (() => {
          @volatile var stop = false
          val clearer = new Thread(() => {
            while (!stop) { spark.catalog.clearCache(); Thread.sleep(20) }
          })
          clearer.setDaemon(true); clearer.start()
          var bad = 0
          for (i <- 1 to 8) {
            val n = SparkEntry.queries("q49_dup_components")(spark, sfDir).count()
            System.err.println(s"[race] iter $i rows=$n")
            if (n == 0) bad += 1
          }
          stop = true
          bad.toDouble
        }))
      case "twinrace2" =>
        // narrower: can the PAIRS frame itself evaluate empty next to
        // a concurrent q27 (no clearCache at all)?
        Seq(
          "pairs_noclear" -> (() => {
            var bad = 0
            for (i <- 1 to 6) {
              val t27 = new Thread(() => {
                SparkEntry.queries("q27_minhash_neardup")(spark, sfDir).count(); ()
              })
              t27.start()
              val n = graft.llm.Dedup.minHashVerifiedPairs(
                graft.core.Tables.documents(spark, sfDir), "doc_id", "text",
                3, 0.5).count()
              t27.join()
              System.err.println(s"[race2] iter $i pairs=$n")
              if (n == 0) bad += 1
            }
            bad.toDouble
          }),
          "q49_noclear" -> (() => {
            var bad = 0
            for (i <- 1 to 6) {
              val t27 = new Thread(() => {
                SparkEntry.queries("q27_minhash_neardup")(spark, sfDir).count(); ()
              })
              t27.start()
              val n = SparkEntry.queries("q49_dup_components")(spark, sfDir).count()
              t27.join()
              System.err.println(s"[race2] iter $i q49=$n")
              if (n == 0) bad += 1
            }
            bad.toDouble
          }))
      case "twinrace" =>
        // does running q27 (same sketch/banded cached plans) + q49
        // concurrently make q49 empty? clearCache after each, like
        // the concurrent Verify.
        Seq("race" -> (() => {
          var bad = 0
          for (i <- 1 to 6) {
            val t27 = new Thread(() => {
              try {
                SparkEntry.queries("q27_minhash_neardup")(spark, sfDir).count()
              } finally spark.catalog.clearCache()
            })
            t27.start()
            val n = try
              SparkEntry.queries("q49_dup_components")(spark, sfDir).count()
            finally spark.catalog.clearCache()
            t27.join()
            System.err.println(s"[race] iter $i q49 rows=$n")
            if (n == 0) bad += 1
          }
          bad.toDouble
        }))
      case "q298" =>
        import spark.implicits._
        val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
          s"graft_warc_zst_v1_${Integer.toHexString(sfDir.hashCode)}")
        val paths = Option(dir.listFiles()).getOrElse(Array.empty)
          .map(_.getAbsolutePath).sorted.toSeq
        System.err.println(s"[profile] ${paths.size} zst files under $dir")
        val n = math.max(1, math.min(paths.size,
          spark.sparkContext.defaultParallelism))
        def rawRead = spark.createDataset(paths).repartition(n).map { p =>
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)).length.toLong
        }.toDF("n")
        def zstStream = spark.createDataset(paths).repartition(n).map { p =>
          try {
            val in = new com.github.luben.zstd.ZstdInputStream(
              new java.io.BufferedInputStream(
                new java.io.FileInputStream(p), 1 << 16))
            val buf = new Array[Byte](1 << 16)
            var total = 0L
            var r = in.read(buf)
            while (r >= 0) { total += r; r = in.read(buf) }
            in.close()
            total
          } catch { case _: Throwable => -1L }
        }.toDF("n")
        def zstOneShot = spark.createDataset(paths).repartition(n).map { p =>
          val c = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
          try com.github.luben.zstd.Zstd.decompressFrame(c, 1 << 24).length.toLong
          catch { case _: Throwable => -1L }
        }.toDF("n")
        Seq(
          "raw_read" -> (() => minOf2(rawRead)),
          "zst_stream" -> (() => minOf2(zstStream)),
          "zst_oneshot" -> (() => minOf2(zstOneShot)),
          "full_q298" -> (() => minOf2(
            SparkEntry.queries("q298_warc_zst")(spark, sfDir)))
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
