package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.spark.sql.SparkSession

/** Distributed metadata change — the reference DistCh
  * (TOOLS/hadoop-extras/src/main/java/org/apache/hadoop/tools/DistCh.java:62):
  * parallel chmod / chown / chgrp over a file tree. Same shape as
  * [[DistCp]]: driver-side recursive listing (metadata is tiny),
  * `foreachPartition`-style FS ops for the actual changes — each task
  * owns a slice of the paths, no data moves at all.
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

  def change(spark: SparkSession, root: String,
             owner: Option[String] = None, group: Option[String] = None,
             perm: Option[String] = None,
             filesOnly: Boolean = false): ChResult = {
    require(owner.nonEmpty || group.nonEmpty || perm.nonEmpty,
      "DistCh: nothing to change (owner, group and perm all empty)")
    val permBits: Option[Short] = perm.map(parsePerm) // validate before any work
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    val fs = new Path(root).getFileSystem(conf)
    val rootPath = fs.makeQualified(new Path(root))

    val all = FsTrees.walk(fs, rootPath)
    val files = all.collect { case (p, _, false) => p.toString }
    val dirs = if (filesOnly) Seq.empty
               else all.collect { case (p, _, true) => p.toString }

    val confBytes = FsTrees.shipConf(conf)
    val (o, g) = (owner.orNull, group.orNull)
    val m: Short = permBits.getOrElse((-1).toShort)

    def runStage(paths: Seq[String]): Long =
      if (paths.isEmpty) 0L
      else {
        val parts = math.max(1,
          math.min(spark.sparkContext.defaultParallelism, paths.size))
        spark.sparkContext.parallelize(paths, parts)
          .mapPartitions { it =>
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
      }

    var n = runStage(files)
    // directories: one parallel stage per depth, deepest level first,
    // so no task ever needs to traverse a directory a concurrent task
    // may already have restricted
    dirs.groupBy(_.count(_ == '/')).toSeq.sortBy(-_._1).foreach { case (_, level) =>
      n += runStage(level)
    }
    ChResult(n)
  }
}
