package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

import graft.SparkSpec

class TypedBytesSpec extends SparkSpec {

  private def enc(v: Any): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    TypedBytes.writeValue(new DataOutputStream(baos), v)
    baos.toByteArray
  }

  private def dec(bytes: Array[Byte]): Any =
    TypedBytes.readValue(new DataInputStream(new ByteArrayInputStream(bytes))).get

  test("golden wire bytes match the reference Type.java layout") {
    // INT 42: code 3 + 4-byte big-endian
    assert(enc(42).toSeq == Seq[Byte](3, 0, 0, 0, 42))
    // LONG 1
    assert(enc(1L).toSeq == Seq[Byte](4, 0, 0, 0, 0, 0, 0, 0, 1))
    // BOOL true: code 2 + 1
    assert(enc(true).toSeq == Seq[Byte](2, 1))
    // STRING "hi": code 7 + len 2 + utf8
    assert(enc("hi").toSeq == Seq[Byte](7, 0, 0, 0, 2, 'h'.toByte, 'i'.toByte))
    // BYTES: code 0 + len + raw
    assert(enc(Array[Byte](9, 8)).toSeq == Seq[Byte](0, 0, 0, 0, 2, 9, 8))
    // DOUBLE 1.0: code 6 + IEEE-754
    assert(enc(1.0).toSeq == Seq[Byte](6, 0x3f, -16, 0, 0, 0, 0, 0, 0))
    // VECTOR [1, "a"]: code 8 + count + elements
    assert(enc(Seq(1, "a")).toSeq ==
      Seq[Byte](8, 0, 0, 0, 2, 3, 0, 0, 0, 1, 7, 0, 0, 0, 1, 'a'.toByte))
    // null: app code 50 + zero length
    assert(enc(null).toSeq == Seq[Byte](50, 0, 0, 0, 0))
  }

  test("decoder handles LIST-until-MARKER and MAP framing") {
    // LIST(9) of INT 1, STRING "x", then MARKER(255)
    val list = Array[Byte](9, 3, 0, 0, 0, 1, 7, 0, 0, 0, 1, 'x'.toByte, -1)
    assert(dec(list) == Vector(1, "x"))
    // MAP(10) count 1: "k" -> INT 7
    val map = Array[Byte](10, 0, 0, 0, 1, 7, 0, 0, 0, 1, 'k'.toByte, 3, 0, 0, 0, 7)
    assert(dec(map) == Map("k" -> 7))
  }

  test("scalar, nested and null values round-trip through encode/decode") {
    val vals = Seq[Any](42, 9999999999L, 2.5, 1.5f, true, "héllo\tworld\n", null,
      Array[Byte](1, 2, 3), Seq(1, 2, 3), Map("a" -> 1, "b" -> 2), Seq(Seq("x"), Seq()))
    vals.foreach {
      case b: Array[Byte] => assert(dec(enc(b)).asInstanceOf[Array[Byte]].toSeq == b.toSeq)
      case v => assert(dec(enc(v)) == v, s"round-trip of $v")
    }
  }

  test("unknown application codes decode as raw-byte buffers (spec 50-200 rule)") {
    val appCoded = Array[Byte](77, 0, 0, 0, 2, 5, 6)
    val got = dec(appCoded).asInstanceOf[TypedBytes.AppBytes]
    assert(got.code == 77 && got.bytes.toSeq == Seq[Byte](5, 6))
  }

  test("pipeTypedBytes through cat is identity on a nested nullable schema") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("flag", BooleanType), StructField("score", DoubleType),
      StructField("payload", BinaryType),
      StructField("tags", ArrayType(StringType))))
    val rows = Seq(
      Row(1L, "a\tb", true, 1.5, Array[Byte](0, 1), Seq("x", "y")),
      Row(2L, null, false, -0.25, null, Seq.empty[String]),
      Row(3L, "plain", null, null, Array.empty[Byte], null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val out = Pipe.pipeTypedBytes(df, Seq("cat"), schema)
    val got = out.collect().sortBy(_.getLong(0))
    assert(got.length == 3)
    assert(got(0).getString(1) == "a\tb" && got(0).getSeq[String](5) == Seq("x", "y"))
    assert(got(1).isNullAt(1) && got(1).isNullAt(4) && got(1).getSeq[String](5).isEmpty)
    assert(got(2).isNullAt(2) && got(2).isNullAt(3) && got(2).isNullAt(5))
    assert(got(0).getAs[Array[Byte]](4).toSeq == Seq[Byte](0, 1))
  }

  test("pipeTypedBytes coerces child's wire widths to the declared schema") {
    // child = cat, but declare a WIDER schema than the wire carries:
    // ints written by an int column must land in a long column
    val inSchema = StructType(Seq(StructField("n", IntegerType)))
    val outSchema = StructType(Seq(StructField("n", LongType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(7), Row(8)), 1), inSchema)
    val out = Pipe.pipeTypedBytes(df, Seq("cat"), outSchema)
    assert(out.collect().map(_.getLong(0)).sorted.toSeq == Seq(7L, 8L))
  }

  test("pipeTypedBytes fails the task when the child exits non-zero") {
    val schema = StructType(Seq(StructField("n", IntegerType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1)), 1), schema)
    val e = intercept[org.apache.spark.SparkException] {
      Pipe.pipeTypedBytes(df, Seq("sh", "-c", "cat > /dev/null; exit 3"), schema).collect()
    }
    assert(e.getMessage.contains("exited with 3") ||
      Option(e.getCause).exists(_.getMessage.contains("exited with 3")))
  }

  test("pipeTypedBytes fails the task when UPSTREAM evaluation dies mid-stream") {
    // ANSI division by zero inside the select: it throws on the writer
    // thread while feeding the child; the child (cat) still exits 0 —
    // without writer-error propagation this would silently truncate
    val schema = StructType(Seq(StructField("q", IntegerType)))
    val df = spark.range(0, 100, 1, 1).toDF("n")
      .select((lit(100) / (col("n") - 50)).cast("int").as("q"))
    val e = intercept[Exception] {
      Pipe.pipeTypedBytes(df, Seq("cat"), schema).collect()
    }
    def mentionsUpstream(t: Throwable): Boolean =
      t != null && (t.getMessage != null && (t.getMessage.contains("upstream failed") ||
        t.getMessage.contains("DIVIDE_BY_ZERO")) || mentionsUpstream(t.getCause))
    assert(mentionsUpstream(e), s"got: $e")
  }

  test("pipeTypedBytes round-trips timestamp and date columns") {
    val schema = StructType(Seq(
      StructField("d", DateType), StructField("t", TimestampType)))
    val rows = Seq(
      Row(java.sql.Date.valueOf("2026-08-12"),
          java.sql.Timestamp.valueOf("2026-08-12 13:00:00.123")),
      Row(null, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val got = Pipe.pipeTypedBytes(df, Seq("cat"), schema).collect()
      .sortBy(r => if (r.isNullAt(0)) "" else r.get(0).toString)
    assert(got.length == 2)
    assert(got(0).isNullAt(0) && got(0).isNullAt(1))
    assert(got(1).get(0).toString == "2026-08-12")
    assert(got(1).get(1).toString.startsWith("2026-08-12 13:00:00.123"))
  }

  test("pipeTypedBytes tolerates a child that closes stdin early and exits 0") {
    val schema = StructType(Seq(StructField("n", IntegerType)))
    val df = spark.range(0, 100000, 1, 1).toDF("n").select(col("n").cast("int"))
    // child reads nothing: the writer hits a broken pipe, but exit 0
    // means the child meant it (the `head` contract)
    val out = Pipe.pipeTypedBytes(df, Seq("sh", "-c", "exit 0"), schema)
    assert(out.count() == 0)
  }

  test("pipeTypedBytes tolerates a child that emits nothing and exits 0") {
    val schema = StructType(Seq(StructField("n", IntegerType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1), Row(2)), 2), schema)
    val out = Pipe.pipeTypedBytes(df, Seq("sh", "-c", "cat > /dev/null"), schema)
    assert(out.count() == 0)
  }
}
