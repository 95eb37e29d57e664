package graft.ops

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Shared plumbing for the distributed file-maintenance jobs
  * ([[DistCp]], [[DistCh]]): driver-side tree listing and shipping a
  * Hadoop `Configuration` (not java-serializable) to tasks as
  * `Writable` bytes.
  */
private[ops] object FsTrees {

  /** Recursive driver-side listing: (path, length, isDirectory), root
    * first. Metadata-only — the tiny side of any tree job; parallelize
    * per top-level child past ~10M entries (SCALE.md trade-off 4). */
  def walk(fs: FileSystem, p: Path): Seq[(Path, Long, Boolean)] = {
    val st = fs.getFileStatus(p)
    if (st.isFile) Seq((p, st.getLen, false))
    else (p, 0L, true) +: fs.listStatus(p).toSeq.flatMap(s => walk(fs, s.getPath))
  }

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
