package graft.ops

import java.io.{DataInputStream, DataOutputStream, EOFException}

import scala.collection.JavaConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The typed-bytes wire format of Hadoop Streaming's `-io typedbytes`
  * mode (hadoop-tools/hadoop-streaming/.../typedbytes/Type.java:26-43,
  * TypedBytesInput.java:75-112, TypedBytesOutput.java): a binary
  * tag-length-value stream — one unsigned type-code byte, then a
  * fixed-width or length-prefixed payload:
  *
  * {{{
  * 0 BYTES   4-byte big-endian length + raw bytes
  * 1 BYTE    1 byte              2 BOOL   1 byte (0/1)
  * 3 INT     4 bytes             4 LONG   8 bytes
  * 5 FLOAT   4 bytes             6 DOUBLE 8 bytes
  * 7 STRING  4-byte length + UTF-8 bytes
  * 8 VECTOR  4-byte count + that many typed values
  * 9 LIST    typed values until a MARKER byte
  * 10 MAP    4-byte count + that many typed key/value pairs
  * 50–200    application codes: 4-byte length + raw bytes
  * 255 MARKER (list terminator)
  * }}}
  *
  * SQL NULL, which Writables never carry on the reference wire, is
  * encoded as application code [[NullCode]] (50) with a zero-length
  * payload — a spec-following reader decodes it as an empty raw-bytes
  * buffer; this codec decodes it back to null.
  *
  * Each DataFrame row crosses the pipe as one VECTOR of its columns
  * (the framing `TypedBytesWritableOutput.writeVector` gives an
  * ArrayWritable); Hadoop streaming's key/value pairing is the
  * 2-column special case. Decoding is schema-directed: the child's
  * output vectors are coerced to the caller-declared `StructType`
  * (typed-bytes is self-describing but width-lossy — e.g. INT vs LONG
  * depends on the child's runtime — so the schema is authoritative).
  */
object TypedBytes {

  val NullCode = 50

  // ---- encode ------------------------------------------------------

  def writeRow(out: DataOutputStream, row: Row): Unit = {
    out.writeByte(8)
    out.writeInt(row.length)
    var i = 0
    while (i < row.length) { writeValue(out, row.get(i)); i += 1 }
  }

  def writeValue(out: DataOutputStream, v: Any): Unit = v match {
    case null =>
      out.writeByte(NullCode); out.writeInt(0)
    case b: Array[Byte] =>
      out.writeByte(0); out.writeInt(b.length); out.write(b)
    case b: Byte => out.writeByte(1); out.writeByte(b.toInt)
    case b: Boolean => out.writeByte(2); out.writeBoolean(b)
    case s: Short => out.writeByte(3); out.writeInt(s.toInt)
    case i: Int => out.writeByte(3); out.writeInt(i)
    case l: Long => out.writeByte(4); out.writeLong(l)
    case f: Float => out.writeByte(5); out.writeFloat(f)
    case d: Double => out.writeByte(6); out.writeDouble(d)
    case s: String =>
      val b = s.getBytes("UTF-8")
      out.writeByte(7); out.writeInt(b.length); out.write(b)
    case seq: scala.collection.Seq[_] =>
      out.writeByte(8); out.writeInt(seq.length)
      seq.foreach(writeValue(out, _))
    case m: scala.collection.Map[_, _] =>
      out.writeByte(10); out.writeInt(m.size)
      m.foreach { case (k, v2) => writeValue(out, k); writeValue(out, v2) }
    case r: Row =>
      out.writeByte(8); out.writeInt(r.length)
      (0 until r.length).foreach(i => writeValue(out, r.get(i)))
    case d: java.math.BigDecimal => writeValue(out, d.toPlainString)
    case d: BigDecimal => writeValue(out, d.bigDecimal.toPlainString)
    // temporal values appear as java.sql types by default and as
    // java.time types under spark.sql.datetime.java8API.enabled; both
    // cross the wire as their ISO-ish toString, and coerce() parses
    // either form back into whichever class the session expects
    case other => writeValue(out, other.toString)
  }

  // ---- decode ------------------------------------------------------

  /** Raw payload of an application-specific code (50–200), kept
    * distinct from BYTES so NullCode round-trips. */
  private[ops] case class AppBytes(code: Int, bytes: Array[Byte])

  /** Read one typed value; None at clean EOF (stream exhausted before
    * a type code — mirrors TypedBytesInput.read returning null). */
  def readValue(in: DataInputStream): Option[Any] = {
    val code = try in.readUnsignedByte() catch { case _: EOFException => return None }
    Some(readBody(in, code))
  }

  private def readBody(in: DataInputStream, code: Int): Any = code match {
    case 0 => readRaw(in)
    case 1 => in.readByte()
    case 2 => in.readBoolean()
    case 3 => in.readInt()
    case 4 => in.readLong()
    case 5 => in.readFloat()
    case 6 => in.readDouble()
    case 7 => new String(readRaw(in), "UTF-8")
    case 8 =>
      val n = in.readInt()
      Vector.fill(n)(readRequired(in))
    case 9 => // LIST: values until MARKER
      val buf = Vector.newBuilder[Any]
      var c = in.readUnsignedByte()
      while (c != 255) { buf += readBody(in, c); c = in.readUnsignedByte() }
      buf.result()
    case 10 =>
      val n = in.readInt()
      (0 until n).map(_ => readRequired(in) -> readRequired(in)).toMap
    case c if c >= 50 && c <= 200 =>
      val b = readRaw(in)
      if (c == NullCode && b.isEmpty) null else AppBytes(c, b)
    case 255 => throw new java.io.IOException("typed-bytes: unexpected MARKER outside a LIST")
    case c => throw new java.io.IOException(s"typed-bytes: unknown type code $c")
  }

  private def readRequired(in: DataInputStream): Any =
    readBody(in, in.readUnsignedByte())

  private def readRaw(in: DataInputStream): Array[Byte] = {
    val n = in.readInt()
    if (n < 0) throw new java.io.IOException(s"typed-bytes: negative length $n")
    val b = new Array[Byte](n)
    in.readFully(b)
    b
  }

  /** Read one row (a top-level VECTOR or LIST) and coerce it to
    * `schema`; None at clean EOF. */
  def readRow(in: DataInputStream, schema: StructType): Option[Row] =
    readValue(in).map {
      case cells: Seq[_] =>
        if (cells.length != schema.length)
          throw new java.io.IOException(
            s"typed-bytes: record has ${cells.length} fields, schema expects ${schema.length}")
        Row.fromSeq(cells.zip(schema.fields).map { case (c, f) => coerce(c, f.dataType) })
      case other => throw new java.io.IOException(
        s"typed-bytes: expected a VECTOR record, got ${other.getClass.getSimpleName}")
    }

  /** Width-lossy wire → declared schema type. */
  def coerce(v: Any, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case BooleanType => v.asInstanceOf[Boolean]
      case ByteType => v match { case b: Byte => b; case i: Int => i.toByte; case l: Long => l.toByte }
      case ShortType => v match { case b: Byte => b.toShort; case i: Int => i.toShort; case l: Long => l.toShort }
      case IntegerType => v match { case b: Byte => b.toInt; case i: Int => i; case l: Long => l.toInt }
      case LongType => v match { case b: Byte => b.toLong; case i: Int => i.toLong; case l: Long => l }
      case FloatType => v match { case f: Float => f; case d: Double => d.toFloat; case n: Number => n.floatValue() }
      case DoubleType => v match { case f: Float => f.toDouble; case d: Double => d; case n: Number => n.doubleValue() }
      case StringType => v match { case s: String => s; case b: Array[Byte] => new String(b, "UTF-8"); case o => o.toString }
      case BinaryType => v match { case b: Array[Byte] => b; case s: String => s.getBytes("UTF-8"); case AppBytes(_, b) => b }
      case ArrayType(et, _) => v.asInstanceOf[Seq[Any]].map(coerce(_, et))
      case MapType(kt, vt, _) =>
        v.asInstanceOf[Map[Any, Any]].map { case (k, x) => coerce(k, kt) -> coerce(x, vt) }
      case st: StructType =>
        val cells = v.asInstanceOf[Seq[Any]]
        Row.fromSeq(cells.zip(st.fields).map { case (c, f) => coerce(c, f.dataType) })
      case d: DecimalType => new java.math.BigDecimal(v.toString)
      case DateType =>
        val d = v match {
          case d: java.sql.Date => d.toLocalDate
          case d: java.time.LocalDate => d
          case s: String => java.time.LocalDate.parse(s)
        }
        if (java8Api) d else java.sql.Date.valueOf(d)
      case TimestampType =>
        val t = v match {
          case t: java.sql.Timestamp => t.toInstant
          case i: java.time.Instant => i
          // java.sql.Timestamp.toString has a space, Instant has 'T'
          case s: String if s.contains("T") => java.time.Instant.parse(s)
          case s: String => java.sql.Timestamp.valueOf(s).toInstant
        }
        if (java8Api) t else java.sql.Timestamp.from(t)
      case _ => v
    }

  /** Which temporal classes `createDataFrame` expects in this session
    * (evaluated on the task thread, where SQLConf is task-local). */
  private def java8Api: Boolean =
    try org.apache.spark.sql.internal.SQLConf.get.datetimeJava8ApiEnabled
    catch { case _: Throwable => false }
}
