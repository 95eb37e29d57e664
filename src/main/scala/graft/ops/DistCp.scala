package graft.ops

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Distributed listing-based file copy — the reference DistCp's actual
  * surface (hadoop-tools/hadoop-distcp/.../SimpleCopyListing.java:60,
  * CopyMapper.java:48, DistCpSync.java:45): copy an arbitrary file tree
  * (any format, not just tables), with `-update` semantics that skip
  * files already present at the destination with the same size.
  *
  * Shape mirrors the reference exactly where it matters at scale: the
  * LISTING is a driver-side recursive walk by default (DistCp's
  * SimpleCopyListing is also single-process — listing metadata is tiny
  * relative to data) with a distributed per-level listing behind
  * `distributedListing` for ~10M+ entry trees, while the BYTES move in
  * parallel tasks, each streaming one file through a temp name +
  * atomic rename (CopyMapper's .distcp.tmp idiom). Spark's role is the
  * scheduler: the file list becomes an RDD partitioned so each task
  * carries a similar byte budget.
  */
object DistCp {

  /** What a copy run did. `skipped` counts -update size-matches. */
  case class CopyResult(copied: Long, skipped: Long, bytes: Long)

  /** What a [[sync]] run did: `copied` new+changed files moved,
    * `deleted` destination paths removed, `skipped` unchanged files. */
  case class SyncResult(copied: Long, deleted: Long, skipped: Long, bytes: Long)

  private case class Entry(rel: String, len: Long)

  /** Read-side token bucket — the `-bandwidth` throttle
    * (TOOLS/hadoop-distcp/.../util/ThrottledInputStream.java:39, wired
    * from DistCpConstants.CONF_LABEL_BANDWIDTH_MB): caps the OBSERVED
    * rate total/elapsed at `maxBytesPerSec` by sleeping before reads,
    * so a capped task converges on the cap regardless of burst shape.
    * Per TASK, as in the reference (cluster-wide cap = per-map cap ×
    * concurrent maps; same contract here with tasks). */
  private final class ThrottledStream(in: java.io.InputStream,
                                      maxBytesPerSec: Long) extends java.io.InputStream {
    private val start = System.nanoTime()
    private var total = 0L
    private def throttle(): Unit =
      while (total * 1e9 / math.max(1L, System.nanoTime() - start) > maxBytesPerSec)
        Thread.sleep(10)
    override def read(): Int = {
      throttle(); val r = in.read(); if (r >= 0) total += 1; r
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      throttle(); val r = in.read(b, off, len); if (r > 0) total += r; r
    }
    override def close(): Unit = in.close()
  }

  /** Copy `src` (file or directory tree) under `dst`.
    *
    * @param update  skip files whose destination already exists with
    *                the same length (DistCp `-update`'s default
    *                size-based skip; the reference adds checksums,
    *                which HDFS provides for free — local/object stores
    *                compare sizes exactly like this).
    * @param checksum  with `update`, ALSO content-compare the
    *                size-matched files (the reference's CRC check,
    *                which `-skipcrccheck` turns off —
    *                TOOLS/hadoop-distcp/.../util/DistCpUtils.java
    *                `checksumsAreEqual`): a same-size rewrite that the
    *                size-skip would silently miss gets copied. Uses
    *                the filesystem's native `getFileChecksum` when
    *                both sides expose a comparable algorithm (free on
    *                HDFS), else streams both files through MD5 — a
    *                full read of every size-matched PAIR, in parallel
    *                tasks. That read cost is the honest price of
    *                content verification on stores without native
    *                checksums; leave it off when size+rerun semantics
    *                are enough.
    * @param distributedListing  list BOTH trees with
    *                [[FsTrees.walkDistributed]] and compute the
    *                `-update` skip set as a distributed join of the
    *                two listings instead of a driver walk + hash map —
    *                the switch for ~10M+ entry trees. Same result
    *                either way (pinned by DistCpSpec).
    * @param bandwidthMB  `-bandwidth`: per-task read-rate cap in MB/s
    *                (0 = unthrottled). Cluster-wide ceiling = cap ×
    *                concurrent tasks, the reference's per-map contract.
    * @param preserve  `-p`: after each copy, stamp the destination
    *                file with the source's permissions and
    *                modification time (the reference's
    *                `-ppt` attribute set; ownership needs a
    *                privileged destination FS and is left to
    *                [[DistCh]]). One extra source stat + two
    *                destination RPCs per file, inside the copy task.
    */
  def copy(spark: SparkSession, src: String, dst: String,
           update: Boolean = false, tasksHint: Int = 0,
           distributedListing: Boolean = false,
           bandwidthMB: Double = 0, checksum: Boolean = false,
           preserve: Boolean = false): CopyResult =
    if (distributedListing) copyDistributed(spark, src, dst, update, tasksHint, bandwidthMB, checksum, preserve)
    else copyDriver(spark, src, dst, update, tasksHint, bandwidthMB, checksum, preserve)

  /** Content summary of one file for the `-update` checksum compare:
    * the filesystem's native checksum (algorithm-tagged, e.g. HDFS's
    * MD5-of-CRC) when it exposes one, else a streamed MD5 of the
    * bytes. Two files compare equal iff their summaries match; when
    * the two SIDES return different algorithm tags (HDFS vs local),
    * the caller re-summarizes both via [[md5Of]] so the comparison is
    * always like-for-like. */
  private def nativeSum(c: Configuration, p: Path): Option[(String, Seq[Byte])] = {
    val fs = p.getFileSystem(c)
    Option(fs.getFileChecksum(p)).map { fc =>
      val bytes = new java.io.ByteArrayOutputStream()
      fc.write(new java.io.DataOutputStream(bytes))
      (fc.getAlgorithmName, bytes.toByteArray.toSeq)
    }
  }

  private def md5Of(c: Configuration, p: Path): Seq[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val in = p.getFileSystem(c).open(p)
    try {
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().toSeq
  }

  /** True iff the two files' contents differ, per the cheapest
    * comparable evidence: native checksums when both sides agree on
    * the algorithm, streamed MD5 of both otherwise. */
  private def sumsDiffer(c: Configuration, src: Path, dst: Path): Boolean =
    (nativeSum(c, src), nativeSum(c, dst)) match {
      case (Some((aAlg, aSum)), Some((bAlg, bSum))) if aAlg == bAlg => aSum != bSum
      case _ => md5Of(c, src) != md5Of(c, dst)
    }

  private def copyDriver(spark: SparkSession, src: String, dst: String,
                         update: Boolean, tasksHint: Int,
                         bandwidthMB: Double, checksum: Boolean,
                         preserve: Boolean): CopyResult = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    val srcFs = new Path(src).getFileSystem(conf)
    val srcPath = srcFs.makeQualified(new Path(src))
    val srcRoot = srcFs.getFileStatus(srcPath)

    // SimpleCopyListing: recursive walk, relative paths from the root.
    val rootUri = (if (srcRoot.isFile) srcPath.getParent else srcPath).toUri
    def rel(p: Path): String = rootUri.relativize(p.toUri).getPath
    val all = FsTrees.walk(srcFs, srcPath)
    val dirs = all.filter(_._3).map(e => rel(e._1)).filter(_.nonEmpty)
    val files = all.filterNot(_._3).map(e => Entry(rel(e._1), e._2))

    val dstFs = new Path(dst).getFileSystem(conf)
    val dstPath = dstFs.makeQualified(new Path(dst))
    // -update: size-based skip against the existing destination tree
    val existing: Map[String, Long] =
      if (!update || !dstFs.exists(dstPath)) Map.empty
      else {
        def walkDst(p: Path): Seq[(String, Long)] = {
          val st = dstFs.getFileStatus(p)
          if (st.isFile) Seq((dstPath.toUri.relativize(p.toUri).getPath, st.getLen))
          else dstFs.listStatus(p).toSeq.flatMap(s => walkDst(s.getPath))
        }
        walkDst(dstPath).toMap
      }
    val srcRootStr = (if (srcRoot.isFile) srcPath.getParent else srcPath).toString
    val (sizeMatched, sizeChanged) =
      files.partition(f => existing.get(f.rel).contains(f.len))
    // -checksum: content-compare the size-matched survivors in
    // parallel tasks (each task reads its pair of files); only the
    // differing RELS come back to the driver — metadata-sized.
    val contentChanged: Seq[Entry] =
      if (!checksum || sizeMatched.isEmpty) Seq.empty
      else {
        val confBytes = FsTrees.shipConf(conf)
        val dstStr = dstPath.toString
        val parts = math.max(1, math.min(
          spark.sparkContext.defaultParallelism, sizeMatched.size))
        spark.sparkContext.parallelize(sizeMatched, parts).mapPartitions { it =>
          val c = FsTrees.readConf(confBytes)
          it.filter(e =>
            sumsDiffer(c, new Path(srcRootStr, e.rel), new Path(dstStr, e.rel)))
        }.collect().toSeq
      }
    val toCopy = sizeChanged ++ contentChanged
    val skipped = files.size - toCopy.size

    // directory structure (incl. empties) created up front, driver-side
    dstFs.mkdirs(dstPath)
    dirs.foreach(d => dstFs.mkdirs(new Path(dstPath, d)))

    runCopies(spark, conf, srcRootStr, dstPath.toString, toCopy, tasksHint,
      bandwidthMB, preserve)
    CopyResult(toCopy.size.toLong, skipped.toLong, toCopy.map(_.len).sum)
  }

  /** The parallel byte-moving stage shared by [[copy]] and [[sync]]:
    * byte-balanced task layout (sort by size desc, round-robin over the
    * partition count so one giant file doesn't serialize a wave), one
    * streamed copy per file. */
  private def runCopies(spark: SparkSession, conf: Configuration,
                        srcRootStr: String, dstStr: String,
                        toCopy: Seq[Entry], tasksHint: Int,
                        bandwidthMB: Double, preserve: Boolean = false): Unit = {
    if (toCopy.isEmpty) return
    val slots = spark.sparkContext.defaultParallelism
    val parts = math.max(1, math.min(if (tasksHint > 0) tasksHint else slots, toCopy.size))
    // place by the round-robin key: parallelize alone would slice
    // the size-sorted list contiguously and give one task ALL the
    // largest files — the exact anti-balance this layout prevents
    val assigned = FsTrees.roundRobin(toCopy, parts)(_.len)
    val confBytes = FsTrees.shipConf(conf)
    val bps = (bandwidthMB * 1024 * 1024).toLong
    spark.sparkContext.parallelize(assigned, parts)
      .partitionBy(new org.apache.spark.HashPartitioner(parts))
      .mapPartitions { it =>
        val c = FsTrees.readConf(confBytes)
        it.map { case (_, e) => copyOne(c, srcRootStr, dstStr, e.rel, bps, preserve); e.len }
      }.count() // materialize the copies
  }

  /** One file: stream through a temp name + atomic rename (CopyMapper's
    * .distcp.tmp idiom — readers never see partial files). */
  private def copyOne(c: Configuration, srcRootStr: String, dstStr: String,
                      rel: String, maxBytesPerSec: Long = 0,
                      preserve: Boolean = false): Unit = {
    val from = new Path(srcRootStr, rel)
    val to = new Path(dstStr, rel)
    val fsIn = from.getFileSystem(c); val fsOut = to.getFileSystem(c)
    val tmp = new Path(to.getParent, s".distcp.tmp.${to.getName}")
    val raw = fsIn.open(from)
    val in = if (maxBytesPerSec > 0) new ThrottledStream(raw, maxBytesPerSec) else raw
    try {
      val out = fsOut.create(tmp, true)
      try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 64 * 1024)
      finally out.close()
    } finally in.close()
    fsOut.delete(to, false)
    if (!fsOut.rename(tmp, to)) sys.error(s"rename failed: $tmp -> $to")
    if (preserve) {
      // -p: stamp source perms + mtime AFTER the rename (stamping the
      // tmp file would lose the mtime to the rename on some stores)
      val st = fsIn.getFileStatus(from)
      fsOut.setPermission(to, st.getPermission)
      fsOut.setTimes(to, st.getModificationTime, -1)
    }
  }

  /** `-diff`-style incremental replication — the capability of
    * DistCpSync (TOOLS/hadoop-distcp/.../DistCpSync.java:45)
    * reinterpreted without HDFS snapshots: the two TREE LISTINGS are
    * the snapshots. Diffing src against dst yields the action sets
    * directly — copy every file that is new or changed (size differs,
    * or src modified after the destination's copy), delete every
    * destination path that no longer exists under src — so a repeated
    * sync converges to a no-op, and dst mirrors src without recopying
    * the unchanged bulk (the point of `-diff` over plain `-update`:
    * deletions propagate too).
    *
    * Change detection is size + newer-mtime. WITHOUT `preserve`, the
    * destination's mtime is the COPY time, so "newer" means "modified
    * after the last sync" — a same-size replacement whose preserved
    * mtime predates the last sync is missed. WITH `preserve`, copies
    * carry the source mtime, the comparison becomes src-vs-prior-src,
    * and only a same-size same-mtime rewrite remains invisible; the
    * `checksum` option closes that last gap by content-comparing every
    * size-matched skip candidate (same contract and read cost as
    * [[copy]]'s checksum flag). Deletes run deepest-first so
    * directories empty out before their own removal.
    */
  def sync(spark: SparkSession, src: String, dst: String,
           tasksHint: Int = 0, bandwidthMB: Double = 0,
           checksum: Boolean = false, preserve: Boolean = false): SyncResult = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    val srcFs = new Path(src).getFileSystem(conf)
    val srcPath = srcFs.makeQualified(new Path(src))
    val srcRoot = srcFs.getFileStatus(srcPath)
    val rootForRel = if (srcRoot.isFile) srcPath.getParent else srcPath
    val rootUri = rootForRel.toUri
    def rel(p: Path): String = rootUri.relativize(p.toUri).getPath

    val srcAll = FsTrees.walkStatuses(srcFs, srcPath)
    val srcDirs = srcAll.filter(_.isDirectory).map(st => rel(st.getPath)).filter(_.nonEmpty)
    val srcFiles = srcAll.filter(_.isFile)
      .map(st => rel(st.getPath) -> ((st.getLen, st.getModificationTime))).toMap

    val dstFs = new Path(dst).getFileSystem(conf)
    val dstPath = dstFs.makeQualified(new Path(dst))
    val dstUri = dstPath.toUri
    val dstAll =
      if (dstFs.exists(dstPath)) FsTrees.walkStatuses(dstFs, dstPath)
      else Seq.empty
    val dstByRel = dstAll.map(st => dstUri.relativize(st.getPath.toUri).getPath -> st)
      .filter(_._1.nonEmpty).toMap

    // copy set: new files, size changes, or src newer than the copy
    val (changedByMeta, skipCandidates) = srcFiles.toSeq.partition {
      case (r, (len, mtime)) => dstByRel.get(r).forall(st =>
        !st.isFile || st.getLen != len || mtime > st.getModificationTime)
    }
    // -checksum: content-compare the metadata-identical candidates in
    // parallel tasks, exactly like copy's checksum path
    val changedByContent: Seq[Entry] =
      if (!checksum || skipCandidates.isEmpty) Seq.empty
      else {
        val confBytes = FsTrees.shipConf(conf)
        val srcRootStr = rootForRel.toString
        val dstStr = dstPath.toString
        val cand = skipCandidates.map { case (r, (len, _)) => Entry(r, len) }
        val parts = math.max(1, math.min(
          spark.sparkContext.defaultParallelism, cand.size))
        spark.sparkContext.parallelize(cand, parts).mapPartitions { it =>
          val c = FsTrees.readConf(confBytes)
          it.filter(e =>
            sumsDiffer(c, new Path(srcRootStr, e.rel), new Path(dstStr, e.rel)))
        }.collect().toSeq
      }
    val toCopy = changedByMeta.map { case (r, (len, _)) => Entry(r, len) } ++
      changedByContent
    // delete set: anything under dst with no src counterpart; children
    // sort after parents lexicographically, so reverse order empties
    // directories before removing them
    val srcRels = srcFiles.keySet ++ srcDirs
    val toDelete = dstByRel.keys.filterNot(srcRels).toSeq.sorted.reverse
    toDelete.foreach(r => dstFs.delete(new Path(dstPath, r), false))

    dstFs.mkdirs(dstPath)
    srcDirs.foreach(d => dstFs.mkdirs(new Path(dstPath, d)))
    runCopies(spark, conf, rootForRel.toString, dstPath.toString, toCopy,
      tasksHint, bandwidthMB, preserve)
    SyncResult(toCopy.size.toLong, toDelete.size.toLong,
      (srcFiles.size - toCopy.size).toLong, toCopy.map(_.len).sum)
  }

  /** The ~10M+ entry path: both listings are per-level distributed
    * frames, the `-update` skip set is a LEFT JOIN of src against dst
    * on relative path (the DistCpSync diff, as a plan), and the
    * byte-balanced layout is a global order-by-size + round-robin slot
    * — the same largest-first placement as the driver path, computed
    * as a window over the (metadata-only) file list. Only directory
    * paths are ever collected to the driver (mkdirs must run before
    * any copy; dirs ≪ files). */
  private def copyDistributed(spark: SparkSession, src: String, dst: String,
                              update: Boolean, tasksHint: Int,
                              bandwidthMB: Double, checksum: Boolean,
                              preserve: Boolean): CopyResult = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    val srcFs = new Path(src).getFileSystem(conf)
    val srcPath = srcFs.makeQualified(new Path(src))
    val srcRoot = srcFs.getFileStatus(srcPath)
    val srcRootStr = (if (srcRoot.isFile) srcPath.getParent else srcPath).toString

    // qualified child paths share the root's prefix, so rel = suffix
    def rels(listing: org.apache.spark.sql.DataFrame, rootStr: String) =
      listing.withColumn("rel", expr(s"substring(path, ${rootStr.length + 2})"))
    val srcAll = FsTrees.walkDistributed(spark, srcPath, conf)
    val all = rels(srcAll, srcRootStr)
    // srcAll is persisted+materialized — derived frames recompute from
    // the cache, so no further persists needed on the metadata side
    val srcFiles = all.where(!col("is_dir")).select("rel", "len")
    val dirRels = all.where(col("is_dir") && length(col("rel")) > 0)
      .select("rel").as[String].collect()

    val dstFs = new Path(dst).getFileSystem(conf)
    val dstPath = dstFs.makeQualified(new Path(dst))
    val dstAll =
      if (!update || !dstFs.exists(dstPath)) None
      else Some(FsTrees.walkDistributed(spark, dstPath, conf))
    val existing = dstAll match {
      case None => Seq.empty[(String, Long)].toDF("rel", "dst_len")
      case Some(a) => rels(a, dstPath.toString)
        .where(!col("is_dir")).select(col("rel"), col("len").as("dst_len"))
    }
    val joined = srcFiles.join(existing, Seq("rel"), "left")
    val sizeChanged = joined
      .where(col("dst_len").isNull || col("dst_len") =!= col("len"))
      .select("rel", "len")
    // -checksum: the size-matched rows stay distributed — each task
    // content-compares its pair of files and keeps only the changed
    // rels; nothing per-file ever reaches the driver on this path.
    val contentChanged =
      if (!checksum) Seq.empty[(String, Long)].toDF("rel", "len")
      else {
        val confBytes2 = FsTrees.shipConf(conf)
        val dstStr0 = dstPath.toString
        joined.where(col("dst_len") === col("len"))
          .select("rel", "len").as[(String, Long)].rdd
          .mapPartitions { it =>
            val c = FsTrees.readConf(confBytes2)
            it.filter { case (r, _) =>
              sumsDiffer(c, new Path(srcRootStr, r), new Path(dstStr0, r)) }
          }.toDF("rel", "len")
      }
    val toCopy = sizeChanged.union(contentChanged)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val nFiles = srcFiles.count()
    val nCopy = toCopy.count()

    dstFs.mkdirs(dstPath)
    dirRels.foreach(d => dstFs.mkdirs(new Path(dstPath, d)))

    var bytes = 0L
    if (nCopy > 0) {
      val slots = spark.sparkContext.defaultParallelism
      val parts = math.max(1, math.min(
        if (tasksHint > 0) tasksHint else slots, nCopy).toInt)
      val dstStr = dstPath.toString
      val confBytes = FsTrees.shipConf(conf)
      // single-task window over file METADATA — same driver-sized cost
      // as the listing sort in the reference's UniformSizeInputFormat
      // range-partition on the slot id: hash(slot) % parts can land two
      // slots in one task and leave another empty; ranges over the
      // dense [0, parts) ids keep one slot per task
      val slotted = toCopy.withColumn("slot",
          pmod(row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("len").desc, col("rel"))), lit(parts)))
        .repartitionByRange(parts, col("slot"))
      val bps = (bandwidthMB * 1024 * 1024).toLong
      bytes = slotted.select("rel", "len").as[(String, Long)].rdd
        .mapPartitions { it =>
          val c = FsTrees.readConf(confBytes)
          it.map { case (rel, len) => copyOne(c, srcRootStr, dstStr, rel, bps, preserve); len }
        }.sum().toLong
    }
    toCopy.unpersist(); srcAll.unpersist(); dstAll.foreach(_.unpersist())
    CopyResult(nCopy, nFiles - nCopy, bytes)
  }
}
