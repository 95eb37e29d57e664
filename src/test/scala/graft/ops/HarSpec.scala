package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.SparkSpec

/** The archive must be readable by the STOCK HarFileSystem — these
  * tests never parse graft's own output; they go through `har://`
  * URIs end to end, which is the compatibility contract.
  */
class HarSpec extends SparkSpec {

  private def mkTree(): String = {
    val root = Files.createTempDirectory("har-src").toString
    Files.createDirectories(Paths.get(s"$root/a/b"))
    Files.writeString(Paths.get(s"$root/top.txt"), "hello har\n")
    Files.writeString(Paths.get(s"$root/a/mid.csv"), "1,2\n3,4\n")
    Files.write(Paths.get(s"$root/a/b/deep.bin"), (0 until 4096).map(_.toByte).toArray)
    Files.writeString(Paths.get(s"$root/a/b/empty.dat"), "")
    root
  }

  private def harFs(harUri: String): FileSystem =
    FileSystem.get(new java.net.URI(harUri), spark.sparkContext.hadoopConfiguration)

  test("archive round-trips every file byte-exact through stock HarFileSystem") {
    val src = mkTree()
    val dst = Files.createTempDirectory("har-out").toString + "/t.har"
    val r = Har.archive(spark, src, dst, partsHint = 2)
    assert(r.files == 4 && r.dirs == 3 && r.parts == 2)
    val harRoot = s"har://${new java.net.URI("file://" + dst).getPath}"
    val fs = harFs(harRoot)
    def readHar(rel: String): Array[Byte] = {
      val in = fs.open(new Path(harRoot + rel))
      try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        buf.toByteArray
      } finally in.close()
    }
    assert(new String(readHar("/top.txt"), "UTF-8") == "hello har\n")
    assert(readHar("/a/b/deep.bin").toSeq ==
      (0 until 4096).map(_.toByte).toSeq)
    assert(readHar("/a/b/empty.dat").isEmpty)
  }

  test("archive directory listing and Spark reads work through har://") {
    val src = mkTree()
    val dst = Files.createTempDirectory("har-out").toString + "/t.har"
    Har.archive(spark, src, dst)
    val harRoot = s"har://$dst"
    val fs = harFs(harRoot)
    val rootNames = fs.listStatus(new Path(harRoot)).map(_.getPath.getName).sorted
    assert(rootNames.toSeq == Seq("a", "top.txt"), rootNames.toSeq)
    val aNames = fs.listStatus(new Path(s"$harRoot/a")).map(_.getPath.getName).sorted
    assert(aNames.toSeq == Seq("b", "mid.csv"), aNames.toSeq)
    // the whole point: a Spark scan straight off the archive
    import spark.implicits._
    val lines = spark.read.textFile(s"$harRoot/a/mid.csv").collect().sorted
    assert(lines.toSeq == Seq("1,2", "3,4"))
  }

  test("parquet tables read in place through har:// (seek-capable archive reads)") {
    // parquet scans need random access (footer seek + row-group reads),
    // the stronger read-side contract than streaming a text file
    val src = Files.createTempDirectory("har-pq").toString
    graft.core.Tables.nation(spark, sf).write.parquet(s"$src/nation.parquet")
    val dst = Files.createTempDirectory("har-out").toString + "/pq.har"
    Har.archive(spark, src, dst)
    val n = spark.read.parquet(s"har://$dst/nation.parquet").count()
    assert(n == graft.core.Tables.nation(spark, sf).count())
  }

  test("archiving a single file keeps its name under a root dir entry") {
    val src = mkTree()
    val dst = Files.createTempDirectory("har-out").toString + "/one.har"
    val r = Har.archive(spark, s"$src/top.txt", dst)
    assert(r.files == 1 && r.dirs == 1)
    val fs = harFs(s"har://$dst")
    val in = fs.open(new Path(s"har://$dst/top.txt"))
    val buf = new java.io.ByteArrayOutputStream()
    try org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false) finally in.close()
    assert(new String(buf.toByteArray, "UTF-8") == "hello har\n")
  }

  test("re-archiving replaces the old archive atomically (staged publish)") {
    val src = mkTree()
    val dst = Files.createTempDirectory("har-out").toString + "/t.har"
    Har.archive(spark, src, dst)
    // change content, archive again over the same destination
    Files.writeString(Paths.get(s"$src/top.txt"), "second version\n")
    Har.archive(spark, src, dst)
    // fresh instance (not FileSystem.get cache); HarFileSystem's
    // static metadata cache revalidates by _masterindex mtime
    val fs = FileSystem.newInstance(new java.net.URI(s"har://$dst"),
      spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(s"har://$dst/top.txt"))
    val buf = new java.io.ByteArrayOutputStream()
    try org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false) finally in.close()
    assert(new String(buf.toByteArray, "UTF-8") == "second version\n")
    // no stale tmp staging dir left behind
    val parent = new java.io.File(dst).getParentFile
    assert(!parent.listFiles().exists(_.getName.contains(".tmp")),
      parent.listFiles().map(_.getName).toSeq)
  }

  test("a >1000-entry archive spans masterindex blocks and stays readable") {
    // 2500 files crosses the 1000-line _index block size twice, so the
    // streamed masterindex write emits ≥3 range rows — and the stock
    // reader must still resolve paths that land in every block
    val root = Files.createTempDirectory("har-many").toString
    (0 until 2500).foreach(i =>
      Files.writeString(Paths.get(f"$root/f$i%04d.txt"), i.toString))
    val dst = Files.createTempDirectory("har-out").toString + "/many.har"
    val r = Har.archive(spark, root, dst, partsHint = 4)
    assert(r.files == 2500 && r.parts == 4, r)
    val masterLines = Files.readAllLines(Paths.get(s"$dst/_masterindex"))
    assert(masterLines.size >= 4, s"expected 3+ block rows, got $masterLines") // "3" + blocks
    val harRoot = s"har://${new java.net.URI("file://" + dst).getPath}"
    val fs = harFs(harRoot)
    assert(fs.listStatus(new Path(harRoot + "/")).length == 2500)
    for (i <- Seq(0, 999, 1000, 1777, 2499)) {
      val in = fs.open(new Path(harRoot + f"/f$i%04d.txt"))
      val buf = new java.io.ByteArrayOutputStream()
      try org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
      finally in.close()
      assert(new String(buf.toByteArray, "UTF-8") == i.toString)
    }
  }

  test("harHash matches the reference's masked String.hashCode") {
    assert(Har.harHash("/") == ("/".hashCode & 0x7fffffff))
    assert(Har.harHash("/a/b.txt") >= 0)
  }

  test("distributed listing produces the same archive surface as the driver path") {
    val src = mkTree()
    val out = Files.createTempDirectory("har-out").toString
    val r1 = Har.archive(spark, src, s"$out/drv.har", partsHint = 2)
    val r2 = Har.archive(spark, src, s"$out/dist.har", partsHint = 2,
      distributedListing = true)
    assert(r2.files == r1.files && r2.dirs == r1.dirs && r2.bytes == r1.bytes, (r1, r2))
    // byte-exact file reads through the stock reader on BOTH archives
    for (rel <- Seq("/top.txt", "/a/mid.csv", "/a/b/deep.bin", "/a/b/empty.dat")) {
      def read(dst: String): Seq[Byte] = {
        val fs = harFs(s"har://$out/$dst")
        val in = fs.open(new Path(s"har://$out/$dst$rel"))
        val buf = new java.io.ByteArrayOutputStream()
        try org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        finally in.close()
        buf.toByteArray.toSeq
      }
      assert(read("dist.har") == read("drv.har"), rel)
    }
  }

  test("100k-entry tree archives via the distributed path and reads back") {
    // the scale contract: the listing, slot assignment, child lists and
    // index all stay distributed — the driver streams, never holds,
    // O(files). 100 dirs x 1000 files (+ dirs + root = 100,101 entries),
    // files created from executors so the fixture build parallelizes.
    val root = Files.createTempDirectory("har-100k").toString
    (0 until 100).foreach(d => Files.createDirectories(Paths.get(f"$root/d$d%03d")))
    spark.sparkContext.parallelize(0 until 100000, 32).foreach { i =>
      val p = Paths.get(f"$root/d${i / 1000}%03d/f$i%06d.txt")
      Files.writeString(p, i.toString)
      ()
    }
    val dst = Files.createTempDirectory("har-out").toString + "/big.har"
    val r = Har.archive(spark, root, dst, distributedListing = true)
    assert(r.files == 100000 && r.dirs == 101, r)
    // every entry made it into the index (streamed count, not a parse)
    val indexLines = Files.lines(Paths.get(s"$dst/_index")).count()
    assert(indexLines == 100101L, indexLines)
    // point reads through the stock HarFileSystem across the range
    val harRoot = s"har://${new java.net.URI("file://" + dst).getPath}"
    val fs = harFs(harRoot)
    for (i <- Seq(0, 1, 999, 50000, 99999)) {
      val in = fs.open(new Path(harRoot + f"/d${i / 1000}%03d/f$i%06d.txt"))
      val buf = new java.io.ByteArrayOutputStream()
      try org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
      finally in.close()
      assert(new String(buf.toByteArray, "UTF-8") == i.toString, i)
    }
    // and a Spark scan straight off one archived directory
    val n = spark.read.textFile(s"$harRoot/d042").count()
    assert(n == 1000L, n)
  }
}
