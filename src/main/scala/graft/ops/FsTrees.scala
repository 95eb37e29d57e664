package graft.ops

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

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
