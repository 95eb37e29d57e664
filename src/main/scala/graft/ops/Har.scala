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
              partsHint: Int = 0, distributedListing: Boolean = false): ArchiveResult = {
    require(dstHar.endsWith(".har"), s"HAR path must end in .har: $dstHar")
    registerScheme(spark)
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    val srcFs = new Path(src).getFileSystem(conf)
    val srcPath = srcFs.makeQualified(new Path(src))
    val srcRootSt = srcFs.getFileStatus(srcPath)
    // the distributed listing exists for huge TREES; a single-file src
    // is by definition not one
    if (distributedListing && srcRootSt.isDirectory)
      return archiveDistributed(spark, srcPath, dstHar, partsHint, conf)
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

    writeIndexAndPublish(dstFs, tmpPath, dstPath, lines)
    fileEntries.unpersist()

    ArchiveResult(nFiles, dirStatuses.size, slices.size, nBytes)
  }

  /** Scale path past driver memory — the [[DistCp.copyDistributed]]
    * posture applied to archiving: the tree is listed level-by-level
    * with the directory frontier spread over executors
    * ([[FsTrees.walkStatusesDistributed]]), file→part assignment is a
    * metadata-only window instead of a driver-side sort, per-dir child
    * lists come from a distributed groupBy on the parent path, and the
    * driver never holds O(files) of anything — its costs are
    * O(directories-per-level) frontiers and the streamed index write.
    * The ~100M-file archives HAR exists for (HadoopArchives.java:84
    * motivates the tool with the namenode small-file problem) don't
    * fit the driver-side listing's multi-GB status Seq. */
  private def archiveDistributed(spark: SparkSession, srcPath: Path,
                                 dstHar: String, partsHint: Int,
                                 conf: org.apache.hadoop.conf.Configuration): ArchiveResult = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val all = FsTrees.walkStatusesDistributed(spark, srcPath, conf)
    val rootStr = srcPath.toString
    // qualified child paths share the root's prefix: rel = "/" + suffix
    val withRel = all.withColumn("rel",
      when(col("path") === rootStr, lit("/"))
        .otherwise(concat(lit("/"), expr(s"substring(path, ${rootStr.length + 2})"))))
    val files = withRel.where(!col("is_dir"))
    val nFiles = files.count()
    val nDirs = withRel.where(col("is_dir")).count()

    val dstFs = new Path(dstHar).getFileSystem(conf)
    val dstPath = dstFs.makeQualified(new Path(dstHar))
    val tmpPath = new Path(dstPath.getParent, s".${dstPath.getName}.tmp")
    dstFs.delete(tmpPath, true)
    dstFs.mkdirs(tmpPath)

    val slots = math.max(1, math.min(
      if (partsHint > 0) partsHint.toLong else spark.sparkContext.defaultParallelism.toLong,
      math.max(1L, nFiles))).toInt
    val confBytes = FsTrees.shipConf(conf)
    val tmpStr = tmpPath.toString

    // byte-balanced slot assignment as a single-task window over file
    // METADATA (len desc round-robin — the driver-sized cost the
    // reference's own listing sort pays); an IDENTITY partitioner on
    // the dense [0, slots) ids then lands exactly one slot per task —
    // range/hash partitioning can merge two slots into one partition
    // (sampled range bounds / hash collisions), which would silently
    // fold two byte-balanced slices into one part file
    val slotted = files.withColumn("slot",
        pmod(row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("len").desc, col("rel"))), lit(slots)))
    val fileEntries: org.apache.spark.rdd.RDD[(Int, String, Long)] =
      slotted.select(col("path"), col("rel"), col("mtime"), col("perm"),
          col("owner"), col("group"), col("slot"))
        .as[(String, String, Long, Int, String, String, Int)].rdd
        .keyBy(_._7)
        .partitionBy(new org.apache.spark.Partitioner {
          override def numPartitions: Int = slots
          override def getPartition(key: Any): Int = key.asInstanceOf[Int]
        })
        .values
        .mapPartitions { it =>
          if (!it.hasNext) Iterator.empty
          else {
            val c = FsTrees.readConf(confBytes)
            val buffered = it.buffered
            val partName = s"part-${buffered.head._7}"
            val outP = new Path(tmpStr, partName)
            val out = outP.getFileSystem(c).create(outP, true)
            // strict: offsets come from the stream position, so the
            // whole slice must be written before the iterator returns
            val entries = try buffered.map { case (pStr, r, mtime, perm, owner, group, _) =>
              val p = new Path(pStr)
              val start = out.getPos
              val in = p.getFileSystem(c).open(p)
              try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 64 * 1024, false)
              finally in.close()
              val len = out.getPos - start
              val pr = enc(s"$mtime $perm ${enc(owner)} ${enc(group)}")
              (harHash(r), s"${enc(r)} file $partName $start $len $pr ", len)
            }.toVector finally out.close()
            entries.iterator
          }
        }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBytes = fileEntries.map(_._3).sum().toLong

    // per-dir child-name lists via a distributed groupBy on the parent
    // path (the one piece the driver path holds as a Map); names
    // sorted for determinism — HarFileSystem does not care about order
    val childAgg = withRel.where(col("path") =!= rootStr)
      .select(regexp_replace(col("path"), "/[^/]*$", "").as("parent"),
        substring_index(col("path"), "/", -1).as("name"))
      .groupBy("parent").agg(sort_array(collect_list(col("name"))).as("names"))
    val dirLines = withRel.where(col("is_dir"))
      .join(childAgg, withRel("path") === childAgg("parent"), "left")
      .select(col("rel"), col("mtime"), col("perm"), col("owner"), col("group"), col("names"))
      .as[(String, Long, Int, String, String, Option[Seq[String]])].rdd
      .map { case (r, mtime, perm, owner, group, names) =>
        val pr = enc(s"$mtime $perm ${enc(owner)} ${enc(group)}")
        (harHash(r), s"${enc(r)} dir $pr 0 0 " +
          names.getOrElse(Seq.empty).map(c => enc(c) + " ").mkString)
      }

    writeIndexAndPublish(dstFs, tmpPath, dstPath,
      fileEntries.map { case (h, l, _) => (h, l) }.union(dirLines))
    fileEntries.unpersist()
    all.unpersist()
    ArchiveResult(nFiles, nDirs, if (nFiles == 0) 0 else slots, nBytes)
  }

  /** Sort the index lines by hash distributed, then stream them into
    * `_index` one partition at a time (the driver never holds
    * O(files) lines), build `_masterindex` ("3", then hash/byte
    * ranges per 1000 lines, O(files/1000)), and publish by replacing
    * the old archive only once the new one is complete on disk. */
  private def writeIndexAndPublish(dstFs: org.apache.hadoop.fs.FileSystem,
                                   tmpPath: Path, dstPath: Path,
                                   linesUnsorted: org.apache.spark.rdd.RDD[(Int, String)]): Unit = {
    val lines = linesUnsorted.sortBy(_._1)
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
    val masterOut = dstFs.create(new Path(tmpPath, "_masterindex"), true)
    try masterOut.write(master.toString.getBytes("UTF-8"))
    finally masterOut.close()

    dstFs.delete(dstPath, true)
    if (!dstFs.rename(tmpPath, dstPath))
      sys.error(s"HAR publish failed: rename $tmpPath -> $dstPath")
  }
}
