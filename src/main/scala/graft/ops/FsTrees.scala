package graft.ops

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared plumbing for the distributed file-maintenance jobs
  * ([[DistCp]], [[DistCh]]): driver-side tree listing and shipping a
  * Hadoop `Configuration` (not java-serializable) to tasks as
  * `Writable` bytes.
  */
private[ops] object FsTrees {

  /** Recursive driver-side listing, root's status first. One RPC per
    * directory (`listStatus` carries every child's full status, so
    * consumers never re-stat). Metadata-only — the tiny side of any
    * tree job; parallelize per top-level child past ~10M entries
    * (SCALE.md trade-off 4). */
  def walkStatuses(fs: FileSystem, p: Path): Seq[FileStatus] = {
    def rec(st: FileStatus): Seq[FileStatus] =
      if (st.isFile) Seq(st)
      else st +: fs.listStatus(st.getPath).toSeq.flatMap(rec)
    rec(fs.getFileStatus(p))
  }

  /** (path, length, isDirectory) view of [[walkStatuses]]. */
  def walk(fs: FileSystem, p: Path): Seq[(Path, Long, Boolean)] =
    walkStatuses(fs, p).map(st =>
      (st.getPath, if (st.isFile) st.getLen else 0L, st.isDirectory))

  /** Distributed tree listing — the scale path past ~10M entries,
    * where the driver-side [[walk]] serializes every listStatus RPC
    * through one thread (SCALE.md trade-off 4; the reference's
    * SimpleCopyListing has the same single-threaded shape). Each ROUND
    * lists one tree LEVEL with the directory frontier spread over
    * executors, so list fan-out scales with the cluster; only
    * directory paths return to the driver between rounds (dirs ≪
    * files in any real tree) while file entries stay distributed in
    * persisted level frames. Rounds = tree depth.
    *
    * Returns (path, len, is_dir) for the root and everything under it
    * — same contents as [[walk]], as ONE persisted DataFrame (already
    * materialized: no listing RPC re-runs on later actions). Callers
    * should `unpersist()` it when done; the per-level scratch frames
    * are released before returning. */
  def walkDistributed(spark: SparkSession, root: Path, conf: Configuration,
                      fanout: Int = 256): DataFrame = {
    import org.apache.spark.sql.types._
    walkLoop(spark, root, conf, fanout,
      StructType(Seq(StructField("path", StringType, nullable = false),
        StructField("len", LongType, nullable = false),
        StructField("is_dir", BooleanType, nullable = false))),
      st => org.apache.spark.sql.Row(st.getPath.toString,
        if (st.isFile) st.getLen else 0L, st.isDirectory))
  }

  /** Full-status variant of [[walkDistributed]] for consumers that
    * need ownership/permission metadata in the listing ([[Har]]'s
    * index props): columns `path, len, is_dir, mtime, perm, owner,
    * group`. Same level-by-level shape and persistence contract:
    * returned persisted + materialized, caller unpersists. */
  def walkStatusesDistributed(spark: SparkSession, root: Path, conf: Configuration,
                              fanout: Int = 256): DataFrame = {
    import org.apache.spark.sql.types._
    walkLoop(spark, root, conf, fanout,
      StructType(Seq(StructField("path", StringType, nullable = false),
        StructField("len", LongType, nullable = false),
        StructField("is_dir", BooleanType, nullable = false),
        StructField("mtime", LongType, nullable = false),
        StructField("perm", IntegerType, nullable = false),
        StructField("owner", StringType), StructField("group", StringType))),
      st => org.apache.spark.sql.Row(st.getPath.toString,
        if (st.isFile) st.getLen else 0L, st.isDirectory,
        st.getModificationTime, st.getPermission.toShort.toInt,
        st.getOwner, st.getGroup))
  }

  /** The one level-by-level walk both distributed listings share,
    * parameterized on the per-status row shape (`schema` must carry
    * `path` and `is_dir` — the frontier columns). Each wrapper hands
    * its caller the exact frame this persists, so the unpersist
    * contract stays intact for both schemas. */
  private def walkLoop(spark: SparkSession, root: Path, conf: Configuration,
                       fanout: Int,
                       schema: org.apache.spark.sql.types.StructType,
                       toRow: FileStatus => org.apache.spark.sql.Row): DataFrame = {
    import spark.implicits._
    val fs = root.getFileSystem(conf)
    val rootSt = fs.getFileStatus(root)
    val confBytes = shipConf(conf)
    val rootRow = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(toRow(rootSt)), 1), schema)
    var levels = Seq.empty[DataFrame]
    var frontier: Seq[String] =
      if (rootSt.isDirectory) Seq(rootSt.getPath.toString) else Seq.empty
    while (frontier.nonEmpty) {
      val parts = math.max(1, math.min(fanout, frontier.size))
      val rows = spark.sparkContext.parallelize(frontier, parts)
        .mapPartitions { it =>
          val c = readConf(confBytes)
          it.flatMap { d =>
            val p = new Path(d)
            p.getFileSystem(c).listStatus(p).iterator.map(toRow)
          }
        }
      // each level is read twice (frontier collect + the final
      // materialization): persist so no level's RPCs run twice
      val level = spark.createDataFrame(rows, schema)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      frontier = level.where(col("is_dir")).select("path").as[String].collect().toSeq
      levels :+= level
    }
    val all = (rootRow +: levels).reduce(_ unionByName _)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    all.count() // materialize from the level caches, then free them
    levels.foreach(_.unpersist())
    all
  }

  /** Byte-balanced task assignment shared by the tree jobs: largest
    * first, round-robin over `slots`, so no task gets all the big
    * files. Returns (slot, item) pairs. */
  def roundRobin[A](items: Seq[A], slots: Int)(size: A => Long): Seq[(Int, A)] =
    items.sortBy(a => -size(a)).zipWithIndex.map { case (a, i) => (i % slots, a) }

  def shipConf(conf: Configuration): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    conf.write(new java.io.DataOutputStream(baos))
    baos.toByteArray
  }

  def readConf(bytes: Array[Byte]): Configuration = {
    val c = new Configuration(false)
    c.readFields(new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes)))
    c
  }
}
