package graft.ops

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Pins [[DistCp.copy]] against the reference DistCp contract
  * (SimpleCopyListing + CopyMapper + -update): full-tree copy of mixed
  * content incl. empty dirs/files, and an -update rerun that copies
  * ONLY the changed file.
  */
class DistCpSpec extends SparkSpec {

  private def mkTree(): String = {
    val root = Files.createTempDirectory("distcp-src").toString
    Files.createDirectories(Paths.get(s"$root/a/b"))
    Files.createDirectories(Paths.get(s"$root/empty"))
    Files.writeString(Paths.get(s"$root/top.txt"), "top-level")
    Files.writeString(Paths.get(s"$root/a/mid.csv"), "1,2,3\n4,5,6\n")
    Files.write(Paths.get(s"$root/a/b/deep.bin"), (0 until 4096).map(_.toByte).toArray)
    Files.writeString(Paths.get(s"$root/a/b/zero.dat"), "")
    root
  }

  private def read(p: String): Seq[Byte] = Files.readAllBytes(Paths.get(p)).toSeq

  test("copies a mixed tree: nested dirs, binary, empty file, empty dir") {
    val src = mkTree()
    val dst = Files.createTempDirectory("distcp-dst").toString + "/out"
    val r = DistCp.copy(spark, src, dst)
    assert(r.copied == 4 && r.skipped == 0)
    assert(read(s"$dst/top.txt") == read(s"$src/top.txt"))
    assert(read(s"$dst/a/mid.csv") == read(s"$src/a/mid.csv"))
    assert(read(s"$dst/a/b/deep.bin") == read(s"$src/a/b/deep.bin"))
    assert(Files.size(Paths.get(s"$dst/a/b/zero.dat")) == 0)
    assert(Files.isDirectory(Paths.get(s"$dst/empty")), "empty dir structure preserved")
    // no tmp litter anywhere in the destination tree
    val walk = Files.walk(Paths.get(dst))
    val litter = try walk.filter(
      _.getFileName.toString.startsWith(".distcp.tmp")).count()
    finally walk.close()
    assert(litter == 0, "tmp files left behind")
  }

  test("-update rerun copies only the changed file") {
    val src = mkTree()
    val dst = Files.createTempDirectory("distcp-dst").toString + "/out"
    assert(DistCp.copy(spark, src, dst).copied == 4)
    // change ONE file (different size so the size-skip sees it)
    Files.writeString(Paths.get(s"$src/a/mid.csv"), "7,8,9\n10,11,12\n13,14,15\n")
    val r2 = DistCp.copy(spark, src, dst, update = true)
    assert(r2.copied == 1, s"expected only the changed file, got ${r2.copied}")
    assert(r2.skipped == 3)
    assert(read(s"$dst/a/mid.csv") == read(s"$src/a/mid.csv"))
    // idempotent third run: everything skips
    val r3 = DistCp.copy(spark, src, dst, update = true)
    assert(r3.copied == 0 && r3.skipped == 4)
  }

  test("-diff sync copies exactly the changed files and deletes removed ones") {
    val src = mkTree()
    val dst = Files.createTempDirectory("distcp-dst").toString + "/out"
    assert(DistCp.copy(spark, src, dst).copied == 4)
    // mutate src: change one file, add one, remove one file and one dir
    Thread.sleep(20) // ensure the change's mtime is after the copy's
    Files.writeString(Paths.get(s"$src/a/mid.csv"), "7,8,9\n10,11,12\n13,14,15\n")
    Files.writeString(Paths.get(s"$src/a/new.txt"), "fresh")
    Files.delete(Paths.get(s"$src/top.txt"))
    Files.delete(Paths.get(s"$src/empty"))
    val r = DistCp.sync(spark, src, dst)
    assert(r.copied == 2, s"expected changed+new only, got $r")
    assert(r.deleted == 2 && r.skipped == 2, r)
    assert(read(s"$dst/a/mid.csv") == read(s"$src/a/mid.csv"))
    assert(read(s"$dst/a/new.txt") == read(s"$src/a/new.txt"))
    assert(!Files.exists(Paths.get(s"$dst/top.txt")), "removed file still in dst")
    assert(!Files.exists(Paths.get(s"$dst/empty")), "removed dir still in dst")
    // repeated sync converges to a no-op
    val r2 = DistCp.sync(spark, src, dst)
    assert(r2.copied == 0 && r2.deleted == 0 && r2.skipped == 4, r2)
  }

  test("-checksum catches a same-size rewrite that the size-skip misses") {
    val src = mkTree()
    val dst = Files.createTempDirectory("distcp-dst").toString + "/out"
    assert(DistCp.copy(spark, src, dst).copied == 4)
    // rewrite ONE file with DIFFERENT content of the SAME length
    assert(Files.size(Paths.get(s"$src/a/mid.csv")) == 12)
    Files.writeString(Paths.get(s"$src/a/mid.csv"), "9,9,9\n8,8,8\n")
    // plain -update: size matches, change silently skipped (documented)
    val r1 = DistCp.copy(spark, src, dst, update = true)
    assert(r1.copied == 0 && r1.skipped == 4, r1)
    assert(read(s"$dst/a/mid.csv") != read(s"$src/a/mid.csv"))
    // -update -checksum: content compare finds it, on BOTH listing paths
    for (distributed <- Seq(false, true)) {
      val rewrite = if (distributed) "3,3,3\n4,4,4\n" else "9,9,9\n8,8,8\n"
      Files.writeString(Paths.get(s"$src/a/mid.csv"), rewrite)
      val r2 = DistCp.copy(spark, src, dst, update = true, checksum = true,
        distributedListing = distributed)
      assert(r2.copied == 1 && r2.skipped == 3, s"distributed=$distributed: $r2")
      assert(read(s"$dst/a/mid.csv") == read(s"$src/a/mid.csv"))
      // idempotent rerun: checksum now matches everywhere
      val r3 = DistCp.copy(spark, src, dst, update = true, checksum = true,
        distributedListing = distributed)
      assert(r3.copied == 0 && r3.skipped == 4, s"distributed=$distributed: $r3")
    }
  }

  test("-p preserves source permissions and modification times") {
    import java.nio.file.attribute.PosixFilePermissions
    val src = mkTree()
    // give one file distinctive perms and an old mtime
    val target = Paths.get(s"$src/a/mid.csv")
    java.nio.file.Files.setPosixFilePermissions(target,
      PosixFilePermissions.fromString("rw-------"))
    val oldMtime = java.nio.file.attribute.FileTime.fromMillis(1500000000000L)
    java.nio.file.Files.setLastModifiedTime(target, oldMtime)

    val dst = Files.createTempDirectory("distcp-dst").toString + "/out"
    assert(DistCp.copy(spark, src, dst, preserve = true).copied == 4)
    val copied = Paths.get(s"$dst/a/mid.csv")
    assert(java.nio.file.Files.getPosixFilePermissions(copied) ==
      PosixFilePermissions.fromString("rw-------"),
      "permissions not preserved")
    assert(java.nio.file.Files.getLastModifiedTime(copied).toMillis == 1500000000000L,
      "mtime not preserved")
    // without -p the copy gets fresh metadata (mtime ~now)
    val dst2 = Files.createTempDirectory("distcp-dst").toString + "/plain"
    DistCp.copy(spark, src, dst2)
    assert(java.nio.file.Files.getLastModifiedTime(
      Paths.get(s"$dst2/a/mid.csv")).toMillis > 1600000000000L)
  }

  test("-diff -checksum catches a same-size rewrite with a non-newer mtime") {
    val src = mkTree()
    val dst = Files.createTempDirectory("distcp-dst").toString + "/out"
    assert(DistCp.copy(spark, src, dst).copied == 4)
    // same-size rewrite whose mtime PREDATES the copy (mv/tar -p shape)
    val target = Paths.get(s"$src/a/mid.csv")
    Files.writeString(target, "9,9,9\n8,8,8\n")
    Files.setLastModifiedTime(target,
      java.nio.file.attribute.FileTime.fromMillis(1500000000000L))
    // metadata-only sync misses it (documented)
    val r1 = DistCp.sync(spark, src, dst)
    assert(r1.copied == 0 && r1.skipped == 4, r1)
    // content-verified sync catches it; -p carries the source mtime
    val r2 = DistCp.sync(spark, src, dst, checksum = true, preserve = true)
    assert(r2.copied == 1 && r2.skipped == 3, r2)
    assert(read(s"$dst/a/mid.csv") == read(s"$src/a/mid.csv"))
    assert(Files.getLastModifiedTime(Paths.get(s"$dst/a/mid.csv")).toMillis
      == 1500000000000L, "sync -p did not preserve the mtime")
    // converged: the preserved mtime keeps the rerun a no-op even
    // without the checksum read
    val r3 = DistCp.sync(spark, src, dst, checksum = true)
    assert(r3.copied == 0 && r3.skipped == 4, r3)
  }

  test("-diff sync deletes a removed subtree deepest-first") {
    val src = mkTree()
    val dst = Files.createTempDirectory("distcp-dst").toString + "/out"
    DistCp.copy(spark, src, dst)
    // remove the whole a/ subtree (a dir containing a dir containing files)
    import scala.jdk.CollectionConverters._
    val w = Files.walk(Paths.get(s"$src/a"))
    try w.sorted(java.util.Comparator.reverseOrder()).iterator().asScala
      .foreach(Files.delete)
    finally w.close()
    val r = DistCp.sync(spark, src, dst)
    // deleted: a/mid.csv, a/b/deep.bin, a/b/zero.dat, a/b, a
    assert(r.deleted == 5 && r.copied == 0, r)
    assert(!Files.exists(Paths.get(s"$dst/a")))
    assert(Files.exists(Paths.get(s"$dst/top.txt")), "surviving file removed")
  }

  test("-bandwidth caps the measured copy rate") {
    val src = Files.createTempDirectory("distcp-src").toString
    // 2 MB file at 1 MB/s: unthrottled this copies in milliseconds;
    // capped it must take >= ~1.5 s (allowing scheduler slop)
    Files.write(Paths.get(s"$src/big.bin"), new Array[Byte](2 * 1024 * 1024))
    val dst = Files.createTempDirectory("distcp-dst").toString + "/out"
    val t0 = System.nanoTime()
    val r = DistCp.copy(spark, s"$src/big.bin", dst, bandwidthMB = 1.0)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(r.copied == 1 && r.bytes == 2 * 1024 * 1024, r)
    assert(read(s"$dst/big.bin").length == 2 * 1024 * 1024)
    assert(sec >= 1.5, f"throttled copy finished in $sec%.2f s — cap not applied")
  }

  test("single-file source copies into the destination dir") {
    val src = mkTree()
    val dst = Files.createTempDirectory("distcp-dst").toString + "/single"
    val r = DistCp.copy(spark, s"$src/top.txt", dst)
    assert(r.copied == 1)
    assert(read(s"$dst/top.txt") == read(s"$src/top.txt"))
  }

  test("DistCh parsePerm: octal with sticky, rwx form, loud rejections") {
    assert(DistCh.parsePerm("644") == Integer.parseInt("644", 8).toShort)
    assert(DistCh.parsePerm("1777") == Integer.parseInt("1777", 8).toShort) // sticky kept
    assert(DistCh.parsePerm("-rw-r--r--") == Integer.parseInt("644", 8).toShort)
    assert(DistCh.parsePerm("rw-r--r--") == Integer.parseInt("644", 8).toShort)
    intercept[IllegalArgumentException] { DistCh.parsePerm("99") }   // not octal
    intercept[IllegalArgumentException] { DistCh.parsePerm("4755") } // setuid unrepresentable
  }

  test("DistCh with dirs included changes directories after files, deepest first") {
    import java.nio.file.attribute.PosixFilePermission._
    val src = mkTree()
    val r = DistCh.change(spark, src, perm = Some("755"))
    // 4 files + root + a + a/b + empty = 8 paths
    assert(r.changed == 8, s"expected 8 paths changed, got ${r.changed}")
    val dirPerms = Files.getPosixFilePermissions(Paths.get(s"$src/a/b"))
    assert(dirPerms.contains(OTHERS_EXECUTE) && !dirPerms.contains(GROUP_WRITE), s"got $dirPerms")
  }

  test("distributedListing copy matches the driver-listing copy, -update included") {
    val src = mkTree()
    val dst = Files.createTempDirectory("distcp-dst").toString + "/out"
    val r = DistCp.copy(spark, src, dst, distributedListing = true)
    assert(r.copied == 4 && r.skipped == 0 && r.bytes == 4117, r)
    assert(read(s"$dst/a/b/deep.bin") == read(s"$src/a/b/deep.bin"))
    assert(Files.isDirectory(Paths.get(s"$dst/empty")))
    // -update rerun: only the changed file moves, diffed via the join
    Files.writeString(Paths.get(s"$src/a/mid.csv"), "1,2,3\n4,5,6\n7,8,9\n")
    val r2 = DistCp.copy(spark, src, dst, update = true, distributedListing = true)
    assert(r2.copied == 1 && r2.skipped == 3, r2)
    assert(read(s"$dst/a/mid.csv") == read(s"$src/a/mid.csv"))
  }

  test("walkDistributed lists exactly what the driver walk lists") {
    val src = mkTree()
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(src).getFileSystem(conf)
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(src))
    val driver = FsTrees.walk(fs, root)
      .map { case (p, len, d) => (p.toString, len, d) }.toSet
    val dist = FsTrees.walkDistributed(spark, root, conf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(dist == driver, s"distributed=${dist.diff(driver)} driver=${driver.diff(dist)}")
  }

  test("DistCh with distributedListing matches the driver-listing result") {
    import java.nio.file.attribute.PosixFilePermission._
    val src = mkTree()
    val r = DistCh.change(spark, src, perm = Some("755"), distributedListing = true)
    assert(r.changed == 8, s"expected 8 paths changed, got ${r.changed}")
    val dirPerms = Files.getPosixFilePermissions(Paths.get(s"$src/a/b"))
    assert(dirPerms.contains(OTHERS_EXECUTE) && !dirPerms.contains(GROUP_WRITE), s"got $dirPerms")
  }

  test("DistCh chmod changes permissions across the tree (octal and rwx specs)") {
    import java.nio.file.attribute.PosixFilePermission._
    val src = mkTree()
    val r = DistCh.change(spark, src, perm = Some("600"), filesOnly = true)
    assert(r.changed == 4, s"expected 4 files changed, got ${r.changed}")
    val perms = Files.getPosixFilePermissions(Paths.get(s"$src/a/b/deep.bin"))
    assert(perms.contains(OWNER_READ) && perms.contains(OWNER_WRITE) &&
      !perms.contains(GROUP_READ) && !perms.contains(OTHERS_READ), s"got $perms")
    DistCh.change(spark, src, perm = Some("-rw-r--r--"), filesOnly = true)
    val perms2 = Files.getPosixFilePermissions(Paths.get(s"$src/top.txt"))
    assert(perms2.contains(GROUP_READ) && perms2.contains(OTHERS_READ) &&
      !perms2.contains(GROUP_WRITE), s"got $perms2")
  }
}
