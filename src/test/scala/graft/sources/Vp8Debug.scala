package graft.sources

/** Scratch debug harness for VP8 bring-up: decodes each fixture and
  * writes the planes to /tmp/vp8/<name>.mine for diffing against the
  * reference planes. Not a test. */
object Vp8Debug {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(
      if (args.nonEmpty) args(0) else "src/test/resources/vp8")
    dir.listFiles().filter(_.getName.endsWith(".webp")).sortBy(_.getName)
      .foreach { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        val end = 20 + ((bytes(16) & 0xff) | ((bytes(17) & 0xff) << 8) |
          ((bytes(18) & 0xff) << 16))
        Vp8.decode(bytes, 20, math.min(end, bytes.length)) match {
          case Some(fr) =>
            val out = new java.io.FileOutputStream(
              s"/tmp/vp8/${f.getName.stripSuffix(".webp")}.mine")
            out.write(fr.y); out.write(fr.u); out.write(fr.v); out.close()
            println(s"${f.getName}: ok ${fr.width}x${fr.height}")
          case None => println(s"${f.getName}: DECODE FAILED")
        }
      }
  }
}
