package graft.ops

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.spark.sql.SparkSession

/** Distributed metadata change — the reference DistCh
  * (TOOLS/hadoop-extras/src/main/java/org/apache/hadoop/tools/DistCh.java:62):
  * parallel chmod / chown / chgrp over a file tree. Same shape as
  * [[DistCp]]: driver-side recursive listing (metadata is tiny),
  * `foreachPartition` FS ops for the actual changes — each task owns a
  * slice of the paths, no data moves at all.
  *
  * Any of `owner`/`group`/`perm` may be None (left unchanged),
  * mirroring DistCh's `[owner][:[group][:[permission]]]` spec.
  */
object DistCh {

  case class ChResult(changed: Long)

  def change(spark: SparkSession, root: String,
             owner: Option[String] = None, group: Option[String] = None,
             perm: Option[String] = None,
             filesOnly: Boolean = false): ChResult = {
    require(owner.nonEmpty || group.nonEmpty || perm.nonEmpty,
      "DistCh: nothing to change (owner, group and perm all empty)")
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    val fs = new Path(root).getFileSystem(conf)
    val rootPath = fs.makeQualified(new Path(root))

    def walk(p: Path): Seq[(String, Boolean)] = {
      val st = fs.getFileStatus(p)
      if (st.isFile) Seq((p.toString, true))
      else (p.toString, false) +: fs.listStatus(p).toSeq.flatMap(s => walk(s.getPath))
    }
    val targets = walk(rootPath).collect {
      case (p, isFile) if isFile || !filesOnly => p
    }

    val confBytes = {
      val baos = new java.io.ByteArrayOutputStream()
      conf.write(new java.io.DataOutputStream(baos)); baos.toByteArray
    }
    val (o, g, m) = (owner.orNull, group.orNull, perm.orNull)
    val parts = math.max(1, math.min(spark.sparkContext.defaultParallelism, targets.size))
    val n = spark.sparkContext.parallelize(targets, parts)
      .mapPartitions { it =>
        val c = new Configuration(false)
        c.readFields(new java.io.DataInputStream(new java.io.ByteArrayInputStream(confBytes)))
        var count = 0L
        it.foreach { pStr =>
          val p = new Path(pStr)
          val pfs = p.getFileSystem(c)
          if (o != null || g != null) pfs.setOwner(p, o, g)
          if (m != null) pfs.setPermission(p, FsPermission.valueOf(
            // accept both octal ("644") and rwx ("-rw-r--r--") specs
            if (m.forall(_.isDigit)) permString(Integer.parseInt(m, 8)) else m))
          count += 1
        }
        Iterator.single(count)
      }.sum().toLong
    ChResult(n)
  }

  /** "-rwxr-x---"-style string for an octal mode (FsPermission.valueOf
    * wants the ls(1) form). */
  private def permString(mode: Int): String = {
    val rwx = Seq("---", "--x", "-w-", "-wx", "r--", "r-x", "rw-", "rwx")
    "-" + rwx((mode >> 6) & 7) + rwx((mode >> 3) & 7) + rwx(mode & 7)
  }
}
