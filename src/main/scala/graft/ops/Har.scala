package graft.ops

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession

/** Hadoop Archive (HAR) writer + read-side registration — the full
  * capability of `hadoop archive`
  * (hadoop-tools/hadoop-archives/.../HadoopArchives.java:660-830,
  * read side hadoop-common/.../fs/HarFileSystem.java:63,560-615):
  * pack a tree of small files into a few part files plus a two-level
  * index, readable in place through `har://` URIs by the stock
  * `HarFileSystem` on every engine that speaks Hadoop filesystems —
  * including this one (`spark.read.*("har:///…")` after
  * [[registerScheme]]).
  *
  * Layout written (version 3, byte-compatible with the reference
  * reader, which this repo's spec verifies by reading through
  * `HarFileSystem` itself):
  *
  * {{{
  * out.har/_index        one line per path, sorted by path-hash:
  *                       enc(path) file part-N start len enc(props)
  *                       enc(path) dir enc(props) 0 0 enc(child)...
  * out.har/_masterindex  "3", then "startHash endHash startPos endPos"
  *                       per 1000-line block of _index
  * out.har/part-N        concatenated file bytes, one per task
  * }}}
  *
  * Scale posture mirrors [[DistCp]]: the driver owns only the LISTING
  * (O(files) once, the reference's own single-process listing shape);
  * the BYTES move in parallel tasks, each streaming its byte-balanced
  * slice into its own part file, and the INDEX is sorted distributed
  * and streamed through the driver one partition at a time — no
  * O(files) collect. The reference writes parts with a MapReduce job;
  * same shape.
  */
object Har {

  case class ArchiveResult(files: Long, dirs: Long, parts: Int, bytes: Long)

  /** Make `har://` resolvable in this session (idempotent). The
    * hadoop-client jars ship HarFileSystem but Spark sessions don't
    * always carry the scheme mapping. */
  def registerScheme(spark: SparkSession): Unit =
    spark.sparkContext.hadoopConfiguration
      .setIfUnset("fs.har.impl", "org.apache.hadoop.fs.HarFileSystem")

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")

  /** modTime perm owner group, URL-encoded as ONE field — with owner
    * and group ALSO encoded individually first, exactly as
    * HadoopArchives.encodeProperties double-encodes them (an owner
    * name with a space must not shift the field layout). */
  private def props(st: FileStatus): String =
    enc(s"${st.getModificationTime} ${st.getPermission.toShort} " +
      s"${enc(st.getOwner)} ${enc(st.getGroup)}")

  /** HarFileSystem.getHarHash: Java String.hashCode masked positive. */
  private[ops] def harHash(relPath: String): Int =
    relPath.hashCode & 0x7fffffff

  def archive(spark: SparkSession, src: String, dstHar: String,
              partsHint: Int = 0): ArchiveResult = {
    require(dstHar.endsWith(".har"), s"HAR path must end in .har: $dstHar")
    registerScheme(spark)
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    val srcFs = new Path(src).getFileSystem(conf)
    val srcPath = srcFs.makeQualified(new Path(src))
    val srcRootSt = srcFs.getFileStatus(srcPath)
    // a single-file src relativizes against its PARENT (DistCp's rule)
    // so the archive holds "/<name>" plus a root dir entry, not a
    // nameless "/" file
    val rootForRel = if (srcRootSt.isFile) srcPath.getParent else srcPath
    val rootUri = rootForRel.toUri
    def rel(p: Path): String = {
      val r = rootUri.relativize(p.toUri).getPath
      if (r.isEmpty) "/" else "/" + r.stripSuffix("/")
    }
    // one listStatus per directory; statuses reused for props and
    // children below — no per-path re-stat on the driver. Each file
    // tuple carries its rel path and encoded props so the copy tasks
    // can emit complete index lines without a driver-side map shipping
    // in the closure.
    val all = FsTrees.walkStatuses(srcFs, srcPath)
    val files = all.filter(_.isFile)
      .map(st => (st.getPath.toString, st.getLen, rel(st.getPath), props(st)))
    val (dirStatuses, childrenByDir) =
      if (srcRootSt.isFile)
        (Seq(srcFs.getFileStatus(rootForRel)),
         Map(rootForRel.toString -> Seq(srcPath.getName)))
      else
        (all.filter(_.isDirectory),
         all.filterNot(_.getPath == srcPath)
           .groupBy(_.getPath.getParent.toString)
           .view.mapValues(_.map(_.getPath.getName)).toMap)

    val dstFs = new Path(dstHar).getFileSystem(conf)
    val dstPath = dstFs.makeQualified(new Path(dstHar))
    // stage into a sibling tmp dir; the existing archive (and its
    // readers) survive until the new one is complete, and a failed
    // run leaves dst untouched (CopyMapper's tmp-then-rename idiom,
    // whole-archive granularity). NOTE: assumes no speculative
    // re-execution of part tasks (off by default) — two attempts of
    // one slot would interleave writes into the same part file.
    val tmpPath = new Path(dstPath.getParent,
      s".${dstPath.getName}.tmp")
    dstFs.delete(tmpPath, true)
    dstFs.mkdirs(tmpPath)

    // byte-balanced slices, one part file per task
    val slots = math.max(1, math.min(
      if (partsHint > 0) partsHint else spark.sparkContext.defaultParallelism,
      math.max(1, files.size)))
    val slices: Seq[(Int, Seq[(String, Long, String, String)])] =
      FsTrees.roundRobin(files, slots)(_._2)
        .groupBy(_._1).view.mapValues(_.map(_._2)).toSeq
    val confBytes = FsTrees.shipConf(conf)
    val tmpStr = tmpPath.toString

    // (harHash, indexLine, bytesWritten) per file — metadata only, and
    // it STAYS distributed: the index is sorted by hash as an RDD and
    // streamed to the single _index file via toLocalIterator, so the
    // driver never holds O(files) index entries (the r5 bound — a
    // ~100M-file archive collected multi-GB of tuples). Offsets come
    // from the OUTPUT STREAM position, not the listed length: a file
    // that grew/shrank between listing and copy must not shift every
    // later entry in its part (HadoopArchives.map uses
    // partStream.getPos the same way).
    val fileEntries: org.apache.spark.rdd.RDD[(Int, String, Long)] =
      if (slices.isEmpty) spark.sparkContext.emptyRDD
      else spark.sparkContext.parallelize(slices, slices.size)
        .flatMap { case (slot, slice) =>
          val c = FsTrees.readConf(confBytes)
          val partName = s"part-$slot"
          val outP = new Path(tmpStr, partName)
          val out = outP.getFileSystem(c).create(outP, true)
          val entries = try slice.map { case (pStr, _, r, pr) =>
            val p = new Path(pStr)
            val start = out.getPos
            val in = p.getFileSystem(c).open(p)
            try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 64 * 1024, false)
            finally in.close()
            val len = out.getPos - start
            (harHash(r), s"${enc(r)} file $partName $start $len $pr ", len)
          } finally out.close()
          entries.iterator
        }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize the copies EXACTLY ONCE before any derived action:
    // sortBy's range-sampling pass would otherwise re-run the
    // side-effecting part writes (idempotent — same slice order, same
    // offsets, create(true) — but double the byte traffic)
    val nBytes = fileEntries.map(_._3).sum().toLong
    val nFiles = files.size

    // dirs are driver-side (dirs ≪ files; children lists need the
    // grouped listing anyway) and join the distributed sort as a tiny RDD
    val dirLines = dirStatuses.map { st =>
      val r = rel(st.getPath)
      val children = childrenByDir.getOrElse(st.getPath.toString, Seq.empty)
      (harHash(r), s"${enc(r)} dir ${props(st)} 0 0 " +
        children.map(c => enc(c) + " ").mkString)
    }
    val lines = fileEntries.map { case (h, l, _) => (h, l) }
      .union(spark.sparkContext.parallelize(dirLines,
        math.max(1, math.min(slots, dirLines.size))))
      .sortBy(_._1)

    // _index + _masterindex ("3", then hash/byte ranges per 1000 lines),
    // streamed: one partition in driver memory at a time, masterindex
    // accumulates O(files/1000)
    val indexOut = dstFs.create(new Path(tmpPath, "_index"), true)
    val master = new StringBuilder("3 \n")
    try {
      var (startHash, startPos, written, curPos, lastHash) = (0, 0L, 0, 0L, 0)
      lines.toLocalIterator.foreach { case (h, line) =>
        val bytes = (line + "\n").getBytes("UTF-8")
        indexOut.write(bytes)
        curPos += bytes.length; written += 1; lastHash = h
        if (written >= 1000) {
          master.append(s"$startHash $lastHash $startPos $curPos \n")
          startHash = lastHash; startPos = curPos; written = 0
        }
      }
      if (written > 0) master.append(s"$startHash $lastHash $startPos $curPos \n")
    } finally indexOut.close()
    fileEntries.unpersist()
    val masterOut = dstFs.create(new Path(tmpPath, "_masterindex"), true)
    try masterOut.write(master.toString.getBytes("UTF-8"))
    finally masterOut.close()

    // publish: replace the old archive only now that the new one is
    // complete on disk
    dstFs.delete(dstPath, true)
    if (!dstFs.rename(tmpPath, dstPath))
      sys.error(s"HAR publish failed: rename $tmpPath -> $dstPath")

    ArchiveResult(nFiles, dirStatuses.size, slices.size, nBytes)
  }
}
