package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.spark.sql.SparkSession

/** Distributed metadata change — the reference DistCh
  * (TOOLS/hadoop-extras/src/main/java/org/apache/hadoop/tools/DistCh.java:62):
  * parallel chmod / chown / chgrp over a file tree. Same shape as
  * [[DistCp]]: a tree listing (driver-side by default; distributed
  * per-level via [[FsTrees.walkDistributed]] on request for ~10M+
  * entry trees), then `foreachPartition`-style FS ops for the actual
  * changes — each task owns a slice of the paths, no data moves at
  * all.
  *
  * Any of `owner`/`group`/`perm` may be None (left unchanged),
  * mirroring DistCh's `[owner][:[group][:[permission]]]` spec. The
  * mode is parsed and validated ON THE DRIVER (fail fast, once):
  * octal up to `1777` (sticky bit supported; setuid/setgid are
  * rejected loudly — `FsPermission` cannot represent them, and
  * silently applying `755` for `4755` would be worse) or the ls(1)
  * `-rwxr-x--x` form.
  *
  * Ordering: files change first (fully parallel), then directories
  * one depth level at a time, DEEPEST FIRST — so a mode that removes
  * directory-execute never cuts off traversal to paths still awaiting
  * their change (children are always done before their parent).
  */
object DistCh {

  case class ChResult(changed: Long)

  /** Octal ("644", "1777") or ls-form ("-rw-r--r--") → FsPermission
    * short, driver-side. */
  private[ops] def parsePerm(m: String): Short =
    if (m.nonEmpty && m.forall(_.isDigit)) {
      require(m.forall(c => c >= '0' && c <= '7'), s"DistCh: '$m' is not octal")
      val mode = Integer.parseInt(m, 8)
      require(mode <= 0x3ff, // 1777 octal: 9 rwx bits + sticky
        s"DistCh: mode $m out of range (setuid/setgid are not representable; max 1777)")
      mode.toShort
    } else FsPermission.valueOf(if (m.length == 9) "-" + m else m).toShort

  /** `distributedListing`: list the tree with [[FsTrees.walkDistributed]]
    * (frontier-per-level Spark jobs) instead of the driver walk — the
    * switch to flip past ~10M entries, where a single-threaded listing
    * loop becomes the job's critical path. Same result either way
    * (pinned by DistChSpec). */
  def change(spark: SparkSession, root: String,
             owner: Option[String] = None, group: Option[String] = None,
             perm: Option[String] = None,
             filesOnly: Boolean = false,
             distributedListing: Boolean = false): ChResult = {
    require(owner.nonEmpty || group.nonEmpty || perm.nonEmpty,
      "DistCh: nothing to change (owner, group and perm all empty)")
    val permBits: Option[Short] = perm.map(parsePerm) // validate before any work
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    val fs = new Path(root).getFileSystem(conf)
    val rootPath = fs.makeQualified(new Path(root))

    val confBytes = FsTrees.shipConf(conf)
    val (o, g) = (owner.orNull, group.orNull)
    val m: Short = permBits.getOrElse((-1).toShort)

    def runStage(paths: org.apache.spark.rdd.RDD[String]): Long =
      paths.mapPartitions { it =>
        val c = FsTrees.readConf(confBytes)
        var count = 0L
        it.foreach { pStr =>
          val p = new Path(pStr)
          val pfs = p.getFileSystem(c)
          if (o != null || g != null) pfs.setOwner(p, o, g)
          if (m >= 0) pfs.setPermission(p, new FsPermission(m))
          count += 1
        }
        Iterator.single(count)
      }.sum().toLong

    def parallelized(paths: Seq[String]): org.apache.spark.rdd.RDD[String] =
      spark.sparkContext.parallelize(paths, math.max(1,
        math.min(spark.sparkContext.defaultParallelism, math.max(paths.size, 1))))

    // (filesRdd, dir levels deepest-first, cache cleanup) per listing path
    val (filesRdd, dirLevels, cleanup) =
      if (distributedListing) {
        import org.apache.spark.sql.functions.{col, size, split}
        import spark.implicits._
        val all = FsTrees.walkDistributed(spark, rootPath, conf)
        val fr = all.where(!col("is_dir")).select("path").as[String].rdd
        val levels = if (filesOnly) Seq.empty else {
          val dirs = all.where(col("is_dir"))
            .withColumn("depth", size(split(col("path"), "/")))
          dirs.select("depth").distinct().as[Int].collect().sorted.reverse.toSeq
            .map(d => dirs.where(col("depth") === d).select("path").as[String].rdd)
        }
        (fr, levels, () => { all.unpersist(); () })
      } else {
        val all = FsTrees.walk(fs, rootPath)
        val files = all.collect { case (p, _, false) => p.toString }
        val dirs = if (filesOnly) Seq.empty
                   else all.collect { case (p, _, true) => p.toString }
        // one stage per depth, deepest level first (see ordering note)
        val levels = dirs.groupBy(_.count(_ == '/')).toSeq.sortBy(-_._1)
          .map { case (_, level) => parallelized(level) }
        (parallelized(files), levels, () => ())
      }

    var n = runStage(filesRdd)
    // directories deepest-first, so no task ever needs to traverse a
    // directory a concurrent task may already have restricted
    dirLevels.foreach { level => n += runStage(level) }
    cleanup()
    ChResult(n)
  }
}
