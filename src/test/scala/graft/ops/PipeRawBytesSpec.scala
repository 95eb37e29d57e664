package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec

/** `-io rawbytes` framing (RawBytesInputWriter.java:30): length-
  * prefixed raw key/value bytes, no tags, no escaping. */
class PipeRawBytesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("key", BinaryType), StructField("value", BinaryType)))

  test("pipeRawBytes through cat is bit-exact on hostile payloads") {
    // bytes that break every text framing: NUL, 0xFF, newline, tab,
    // a 4-byte sequence that LOOKS like a length header, and empty
    val payloads: Seq[Array[Byte]] = Seq(
      Array[Byte](0, 1, 2, 3),
      Array[Byte](-1, -128, 127),
      "line1\nline2\tcol2".getBytes("UTF-8"),
      Array[Byte](0, 0, 0, 5),
      Array.empty[Byte])
    val rows = payloads.zipWithIndex.map { case (b, i) =>
      Row(s"k$i".getBytes("UTF-8"), b)
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val got = Pipe.pipeRawBytes(df, Seq("cat")).collect()
      .map(r => new String(r.getAs[Array[Byte]](0), "UTF-8") ->
        r.getAs[Array[Byte]](1).toSeq).toMap
    assert(got.size == payloads.size)
    payloads.zipWithIndex.foreach { case (b, i) =>
      assert(got(s"k$i") == b.toSeq, s"payload $i corrupted")
    }
  }

  test("pipeRawBytes: a transforming child sees exact frames both ways") {
    // child reads each [len][bytes] frame and echoes [len][bytes] with
    // the bytes reversed — exercises real parsing on the child side,
    // not just stream passthrough
    val py =
      """import sys,struct
        |r,w=sys.stdin.buffer,sys.stdout.buffer
        |while True:
        |    h=r.read(4)
        |    if len(h)<4: break
        |    n=struct.unpack('>i',h)[0]; b=r.read(n)
        |    w.write(struct.pack('>i',n)); w.write(b[::-1])
        |w.flush()""".stripMargin
    val rows = Seq(Row("k".getBytes("UTF-8"), Array[Byte](1, 2, 3, 4)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val out = Pipe.pipeRawBytes(df, Seq("python3", "-c", py)).collect().head
    assert(new String(out.getAs[Array[Byte]](0), "UTF-8") == "k")
    assert(out.getAs[Array[Byte]](1).toSeq == Seq[Byte](4, 3, 2, 1))
  }

  test("pipeRawBytes fails the task when the child exits non-zero") {
    val rows = Seq(Row(Array[Byte](1), Array[Byte](2)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val e = intercept[org.apache.spark.SparkException] {
      Pipe.pipeRawBytes(df, Seq("sh", "-c", "cat > /dev/null; exit 3")).collect()
    }
    assert(e.getMessage.contains("exited with 3") ||
      Option(e.getCause).exists(_.getMessage.contains("exited with 3")))
  }

  test("pipeRawBytes casts string columns and writes nulls as empty") {
    val df = Seq(("a", "hello"), ("b", null)).toDF("k", "v")
    val got = Pipe.pipeRawBytes(df, Seq("cat")).collect()
      .map(r => new String(r.getAs[Array[Byte]](0), "UTF-8") ->
        new String(r.getAs[Array[Byte]](1), "UTF-8")).toMap
    assert(got == Map("a" -> "hello", "b" -> ""))
  }

  test("truncated child output (EOF mid-frame) fails loudly") {
    // child emits a length header promising 100 bytes then exits 0
    val sh = "cat > /dev/null; printf '\\000\\000\\000\\144'"
    val rows = Seq(Row(Array[Byte](1), Array[Byte](2)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val e = intercept[org.apache.spark.SparkException] {
      Pipe.pipeRawBytes(df, Seq("sh", "-c", sh)).collect()
    }
    def eofish(t: Throwable): Boolean =
      t != null && (t.isInstanceOf[java.io.EOFException] || eofish(t.getCause))
    assert(eofish(e) || e.getMessage.contains("EOF"))
  }
}
