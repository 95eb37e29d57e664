package graft.sources

import org.apache.hadoop.io.{BytesWritable, LongWritable, Text}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Compatibility sources for the reference's row-file formats. The
  * engine's native format is Parquet (TESTDATA.md); these exist so a
  * user migrating from the reference can read legacy data in place.
  *
  * Each reader returns a DataFrame immediately, so downstream pruning
  * and filtering still apply (after the scan — these row formats have
  * no statistics to push into, same as on the reference).
  */
/** The ArrayWritable-subclass pattern Hadoop requires for array-valued
  * SequenceFiles (ArrayWritable.java:46 has no no-arg constructor, so
  * the deserializer can only instantiate a subclass that pins the
  * element class) — Text elements, the common feature-list shape. A
  * top-level class so its stable name lands in file headers and
  * reflection can instantiate it on any executor. */
class TextArrayWritable extends org.apache.hadoop.io.ArrayWritable(classOf[Text])

/** GenericWritable subclass (io/GenericWritable.java:80) — the
  * tagged-union value idiom: the stream stores a one-byte INDEX into
  * this `getTypes` array before each payload, so the member order is
  * part of the on-disk format and must never be reordered. Members
  * cover the string/integer/floating shapes legacy union files mixed.
  * Top-level class (stable name in file headers, reflectable on any
  * executor), no-arg constructor via GenericWritable itself. */
class UnionWritable extends org.apache.hadoop.io.GenericWritable {
  override protected def getTypes: Array[Class[_ <: org.apache.hadoop.io.Writable]] =
    Array(classOf[Text], classOf[LongWritable],
      classOf[org.apache.hadoop.io.DoubleWritable])
}

/** TwoDArrayWritable subclass (io/TwoDArrayWritable.java): same
  * no-no-arg-constructor rule as ArrayWritable — files must declare a
  * subclass pinning the element class, which is also what makes the
  * element type header-discoverable. Text elements. */
class TextTwoDArrayWritable extends org.apache.hadoop.io.TwoDArrayWritable(classOf[Text])

object CompatSources {

  /** KeyValueTextInputFormat (.../lib/input/KeyValueTextInputFormat.java:47):
    * each line split at the first separator → (key, value). Lines
    * without the separator become (line, ""). */
  def kvText(spark: SparkSession, path: String, sep: String = "\t"): DataFrame = {
    val p = java.util.regex.Pattern.quote(sep)
    spark.read.text(path).select(
      split(col("value"), p, 2).getItem(0).as("key"),
      coalesce(get(split(col("value"), p, 2), lit(1)), lit("")).as("value"))
  }

  /** FixedLengthInputFormat (.../lib/input/FixedLengthInputFormat.java:47):
    * constant-length binary records, no delimiters. Built on the very
    * Hadoop InputFormat (public API on Spark's classpath), so records
    * split correctly across HDFS-style block boundaries at any scale.
    * Output: one binary `record` column. */
  def fixedLength(spark: SparkSession, path: String, recordLength: Int): DataFrame = {
    val conf = new org.apache.hadoop.conf.Configuration(spark.sparkContext.hadoopConfiguration)
    conf.setInt("fixedlengthinputformat.record.length", recordLength)
    val rdd = spark.sparkContext.newAPIHadoopFile(
      path,
      classOf[org.apache.hadoop.mapreduce.lib.input.FixedLengthInputFormat],
      classOf[LongWritable], classOf[BytesWritable], conf)
      .map { case (_, v) => java.util.Arrays.copyOf(v.getBytes, v.getLength) }
    import spark.implicits._
    rdd.toDF("record")
  }

  /** SequenceFile with Text key/value (SequenceFileInputFormat —
    * .../lib/input/SequenceFileInputFormat.java:41). */
  def sequenceFileText(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.sequenceFile(path, classOf[Text], classOf[Text])
      .map { case (k, v) => (k.toString, v.toString) }
      .toDF("key", "value")
  }

  /** The declared key/value Writable class names of a SequenceFile —
    * read from the file HEADER (io/SequenceFile.java:1903 reads the
    * same two class-name strings), so [[sequenceFileAuto]] can dispatch
    * without the caller knowing how the legacy file was written. On a
    * directory, sniffs the first non-underscore data file (all parts of
    * one output share a header by construction). */
  def sequenceFileClasses(spark: SparkSession, path: String): (String, String) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path), conf)
    val p = new org.apache.hadoop.fs.Path(path)
    val target = if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).filter(_.isFile).map(_.getPath)
        .filterNot(_.getName.startsWith("_")).headOption.getOrElse(
          throw new IllegalArgumentException(s"no data files under $path"))
    else p
    val r = new org.apache.hadoop.io.SequenceFile.Reader(conf,
      org.apache.hadoop.io.SequenceFile.Reader.file(target))
    try (r.getKeyClassName, r.getValueClassName)
    finally r.close()
  }

  private val writableTypes: Map[String, org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    Map(
      "org.apache.hadoop.io.Text" -> StringType,
      "org.apache.hadoop.io.IntWritable" -> IntegerType,
      "org.apache.hadoop.io.LongWritable" -> LongType,
      "org.apache.hadoop.io.FloatWritable" -> FloatType,
      "org.apache.hadoop.io.DoubleWritable" -> DoubleType,
      "org.apache.hadoop.io.BooleanWritable" -> BooleanType,
      "org.apache.hadoop.io.BytesWritable" -> BinaryType)
  }

  /** One Writable → one Spark value; record readers REUSE Writable
    * instances, so every conversion copies out of the buffer.
    * Container Writables recurse: MapWritable/SortedMapWritable
    * (heterogeneous Writable→Writable maps, io/MapWritable.java:37) →
    * `Map[String, String]` with both sides rendered through their
    * primitive conversion then stringified — the representation that
    * survives ANY mix of per-entry types, which is MapWritable's
    * whole point; ArrayWritable (io/ArrayWritable.java:46) →
    * `Seq` of its homogeneous element conversion. Binary map entries
    * have no faithful string form and fail loudly toward
    * [[sequenceFileBinary]]. */
  private def fromWritable(w: org.apache.hadoop.io.Writable): Any = w match {
    case t: Text => t.toString
    case i: org.apache.hadoop.io.IntWritable => i.get
    case l: LongWritable => l.get
    case f: org.apache.hadoop.io.FloatWritable => f.get
    case d: org.apache.hadoop.io.DoubleWritable => d.get
    case b: org.apache.hadoop.io.BooleanWritable => b.get
    case b: BytesWritable => java.util.Arrays.copyOf(b.getBytes, b.getLength)
    case m: org.apache.hadoop.io.AbstractMapWritable =>
      import scala.jdk.CollectionConverters._
      m.asInstanceOf[java.util.Map[org.apache.hadoop.io.Writable, org.apache.hadoop.io.Writable]]
        .asScala.map { case (k, v) =>
          stringifyEntry(fromWritable(k)) -> stringifyEntry(fromWritable(v))
        }.toMap
    case a: org.apache.hadoop.io.ArrayWritable => a.get().toSeq.map(fromWritable)
    // tagged unions → struct<tag: string, value: string>: the concrete
    // class (GenericWritable) / declared class (ObjectWritable) is the
    // tag, the payload its stringified primitive conversion — the one
    // static schema a per-row-dynamic type fits, same rationale as the
    // MapWritable entry stringification above. Binary/nested members
    // fail loudly toward sequenceFileBinary (stringifyEntry's rule).
    case g: org.apache.hadoop.io.GenericWritable =>
      val inner = g.get()
      org.apache.spark.sql.Row(inner.getClass.getName,
        stringifyEntry(fromWritable(inner)))
    case o: org.apache.hadoop.io.ObjectWritable =>
      val v = o.get() match {
        case w: org.apache.hadoop.io.Writable => fromWritable(w)
        case x => x // declared-primitive/String instances arrive boxed
      }
      org.apache.spark.sql.Row(o.getDeclaredClass.getName, stringifyEntry(v))
    case t: org.apache.hadoop.io.TwoDArrayWritable =>
      t.get().toSeq.map(_.toSeq.map(fromWritable))
    case _: org.apache.hadoop.io.NullWritable => null
    case other => throw new IllegalArgumentException(
      s"unsupported Writable ${other.getClass.getName}")
  }

  private def stringifyEntry(v: Any): String = v match {
    case null => null
    case _: Array[Byte] | _: Map[_, _] | _: Seq[_] =>
      throw new IllegalArgumentException(
        "MapWritable entries of binary/nested type have no faithful string form - " +
          "read via sequenceFileBinary and decode explicitly")
    case s => String.valueOf(s)
  }

  /** Typed SequenceFile reader — dispatches on the header's declared
    * key/value classes, so legacy files with numeric Writable keys (the
    * default WordCount output shape, LIB/output/SequenceFileOutputFormat
    * .java:43) read as properly-typed columns with no cast shim.
    * Supports Text, Int/Long/Float/Double/BooleanWritable, BytesWritable
    * and NullWritable on either side, plus the container Writables
    * legacy feature stores lean on: MapWritable/SortedMapWritable →
    * `map<string,string>` and ArrayWritable subclasses → `array<t>`
    * (see [[writableColumnType]]); a NullWritable side (the
    * values-only idiom) drops its column rather than materializing a
    * null column. Anything exotic fails LOUDLY with the class name —
    * use [[sequenceFileBinary]] plus a custom decode for those. */
  /** Column type for a header-declared Writable class, beyond the
    * primitive [[writableTypes]] table: MapWritable/SortedMapWritable
    * → `MapType(string, string)` (per-entry types are dynamic — the
    * stringified form is the one schema that fits them all);
    * an ArrayWritable SUBCLASS → `ArrayType` of its element type.
    * Plain `ArrayWritable` cannot appear in a valid file: it has no
    * no-arg constructor, so Hadoop itself can't deserialize it — the
    * classic requirement that array-valued SequenceFiles declare a
    * subclass, which is also what makes the element type discoverable
    * here (instantiate the subclass, ask `getValueClass`). */
  /** Schema of a tagged-union column (GenericWritable subclasses and
    * ObjectWritable): the per-row-dynamic member type becomes
    * struct<tag, value> — SURVEY §1.2's ADT mapping flattened to the
    * stringified form the heterogeneous-container convention already
    * uses for MapWritable entries. */
  private val unionColumnType: org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField("tag", StringType), StructField("value", StringType)))
  }

  private def writableColumnType(c: String): Option[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    writableTypes.get(c).orElse {
      if (c == "org.apache.hadoop.io.MapWritable" ||
          c == "org.apache.hadoop.io.SortedMapWritable")
        Some(MapType(StringType, StringType))
      else if (c == "org.apache.hadoop.io.ObjectWritable")
        Some(unionColumnType)
      else
        try {
          val cls = Class.forName(c)
          if (classOf[org.apache.hadoop.io.GenericWritable].isAssignableFrom(cls))
            Some(unionColumnType)
          else if (classOf[org.apache.hadoop.io.TwoDArrayWritable].isAssignableFrom(cls)) {
            // TwoDArrayWritable exposes no getValueClass; the element
            // class lives in its private `valueClass` field (set by the
            // subclass constructor — the only way a readable file
            // exists). Hadoop is classpath (unnamed-module) code, so
            // setAccessible is permitted under Java 17.
            val f = classOf[org.apache.hadoop.io.TwoDArrayWritable]
              .getDeclaredField("valueClass")
            f.setAccessible(true)
            val elem = f.get(cls.getDeclaredConstructor().newInstance())
              .asInstanceOf[Class[_]].getName
            writableTypes.get(elem).map(t => ArrayType(ArrayType(t)))
          } else if (classOf[org.apache.hadoop.io.ArrayWritable].isAssignableFrom(cls))
            writableTypes.get(
              cls.getDeclaredConstructor().newInstance()
                .asInstanceOf[org.apache.hadoop.io.ArrayWritable].getValueClass.getName)
              .map(ArrayType(_))
          else None
        } catch { case _: ReflectiveOperationException => None }
    }
  }

  def sequenceFileAuto(spark: SparkSession, path: String): DataFrame = {
    import org.apache.hadoop.io.Writable
    val nullW = "org.apache.hadoop.io.NullWritable"
    val (kc, vc) = sequenceFileClasses(spark, path)
    val types = Seq(kc, vc).map(c => c -> writableColumnType(c)).toMap
    for (c <- Seq(kc, vc) if c != nullW && types(c).isEmpty)
      throw new IllegalArgumentException(
        s"sequenceFileAuto: no column mapping for $c - read via sequenceFileBinary")
    val fields = Seq("key" -> kc, "value" -> vc).collect {
      case (n, c) if c != nullW => org.apache.spark.sql.types.StructField(n, types(c).get)
    }
    val schema = org.apache.spark.sql.types.StructType(fields)
    val (useK, useV) = (kc != nullW, vc != nullW)
    val rows = spark.sparkContext.newAPIHadoopFile(
      path,
      classOf[org.apache.hadoop.mapreduce.lib.input.SequenceFileInputFormat[Writable, Writable]],
      classOf[Writable], classOf[Writable],
      new org.apache.hadoop.conf.Configuration(spark.sparkContext.hadoopConfiguration))
      .map { case (k, v) =>
        val cells = (if (useK) Seq(fromWritable(k)) else Nil) ++
          (if (useV) Seq(fromWritable(v)) else Nil)
        org.apache.spark.sql.Row(cells: _*)
      }
    spark.createDataFrame(rows, schema)
  }

  /** SequenceFileAsBinaryInputFormat (.../lib/input/
    * SequenceFileAsBinaryInputFormat.java:38): key/value bytes exactly
    * as stored, no Writable interpretation. Output: (key, value) binary
    * columns. BytesWritable buffers are reused by the record reader, so
    * each is copied to its logical length before leaving the scan. */
  def sequenceFileBinary(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .sequenceFile(path, classOf[BytesWritable], classOf[BytesWritable])
      .map { case (k, v) =>
        (java.util.Arrays.copyOf(k.getBytes, k.getLength),
         java.util.Arrays.copyOf(v.getBytes, v.getLength))
      }.toDF("key", "value")
  }

  /** StreamXmlRecordReader capability
    * (hadoop-tools/hadoop-streaming/.../StreamXmlRecordReader.java):
    * one record per `<tag>…</tag>` element. This implementation reads
    * whole files (`wholeTextFiles`) and splits in memory — correct for
    * many-small-XML-files corpora (the common legacy layout); a
    * single multi-GB XML file would need a boundary-aware InputFormat,
    * which we deliberately don't port (XML at that scale should be
    * converted once, via this reader, into parquet). */
  def xmlRecords(spark: SparkSession, path: String, tag: String): DataFrame = {
    import spark.implicits._
    val (open, close) = (s"<$tag", s"</$tag>")
    // `<$tag` must be followed by '>', whitespace or '/' — a bare
    // prefix match would capture longer tag names (<items> for "item")
    def isTagBoundary(c: Char) = c == '>' || c == '/' || c.isWhitespace
    spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (_, content) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var from = 0
        var s = content.indexOf(open, from)
        while (s >= 0) {
          val boundary = s + open.length
          if (boundary < content.length && isTagBoundary(content.charAt(boundary))) {
            val e = content.indexOf(close, s)
            if (e >= 0) {
              out += content.substring(s, e + close.length)
              from = e + close.length
            } else from = content.length
          } else from = s + 1
          s = if (from < content.length) content.indexOf(open, from) else -1
        }
        out
      }.toDF("record")
  }

  /** Split-streamable sibling of [[xmlRecords]] for SINGLE LARGE XML
    * files: sets `textinputformat.record.delimiter` to the element's
    * close tag, so the line reader yields one chunk per element and
    * handles records spanning split boundaries exactly like long lines
    * (the record reader reads past its split end to the next
    * delimiter) — no whole-file materialization at any file size.
    * Mirrors StreamXmlRecordReader's begin/end-pattern scan
    * (hadoop-tools/hadoop-streaming/.../StreamXmlRecordReader.java:119)
    * including its default non-nesting contract: same-name nested
    * elements and self-closing `<tag/>` forms are out of scope both
    * there and here. */
  def xmlRecordsStreamed(spark: SparkSession, path: String, tag: String): DataFrame = {
    import spark.implicits._
    val close = s"</$tag>"
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", close)
    val open = s"<$tag"
    spark.sparkContext.newAPIHadoopFile(path,
        classOf[org.apache.hadoop.mapreduce.lib.input.TextInputFormat],
        classOf[LongWritable], classOf[Text], conf)
      .flatMap { case (_, t) =>
        // chunk = everything since the previous close tag (exclusive);
        // locate the first true open-tag boundary inside it
        val chunk = t.toString
        def isTagBoundary(c: Char) = c == '>' || c == '/' || c.isWhitespace
        var s = chunk.indexOf(open)
        var found = -1
        while (s >= 0 && found < 0) {
          val b = s + open.length
          if (b < chunk.length && isTagBoundary(chunk.charAt(b))) found = s
          else s = chunk.indexOf(open, s + 1)
        }
        if (found >= 0) Some(chunk.substring(found) + close) else None
      }.toDF("record")
  }

  /** AutoInputFormat capability (.../streaming/AutoInputFormat.java):
    * sniff a file's format from magic bytes. */
  def sniffFormat(spark: SparkSession, path: String): String = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val target = if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).filter(_.isFile).map(_.getPath)
        .filterNot(_.getName.startsWith("_")).headOption.getOrElse(p)
    else p
    val in = fs.open(target)
    val magic = new Array[Byte](4)
    // loop: a single read() may legally return fewer bytes than asked
    val n = try {
      var read = 0
      var r = 0
      while (read < 4 && { r = in.read(magic, read, 4 - read); r >= 0 }) read += r
      read
    } finally in.close()
    val s = magic.take(math.max(n, 0)).map(_ & 0xff).toSeq
    if (s.startsWith(Seq(0x50, 0x41, 0x52, 0x31))) "parquet"       // PAR1
    else if (s.startsWith(Seq(0x53, 0x45, 0x51))) "sequencefile"   // SEQ
    else "text"
  }

  /** TextOutputFormat sink (.../lib/output/TextOutputFormat.java:44):
    * `key<sep>value` lines. `codec` maps the reference's
    * `FileOutputFormat.setOutputCompressorClass` (.../lib/output/
    * FileOutputFormat.java:118): "bzip2"|"gzip"|"lz4"|"deflate"|"snappy".
    * At scale prefer bzip2/none — Hadoop's BZip2 codec is splittable
    * (io/compress/SplittableCompressionCodec.java), so a later scan
    * still parallelizes; a gzip part is one split forever. Reads are
    * codec-transparent (extension-dispatched), so [[kvText]] needs no
    * flag. */
  def kvTextWrite(df: DataFrame, path: String, sep: String = "\t",
                  codec: Option[String] = None): Unit = {
    // nulls serialize as empty fields (concat_ws would drop them and
    // shift the layout)
    val lines = df.select(concat_ws(sep,
        df.columns.toIndexedSeq.map(c => coalesce(col(c).cast("string"), lit(""))): _*).as("value"))
      .write.mode("overwrite")
    codec.fold(lines)(c => lines.option("compression", c)).text(path)
  }

  /** SequenceFileOutputFormat sink (.../lib/output/
    * SequenceFileOutputFormat.java:43) for two string columns.
    * `codec` + `blockCompress` select among the reference's three
    * SequenceFile layouts (io/SequenceFile.java:237 CompressionType:
    * NONE / RECORD / BLOCK): None → uncompressed; Some("gzip"|"bzip2"|
    * "deflate") → record- or block-compressed via the same Hadoop
    * codec classes the reference uses. BLOCK is the scale default —
    * it compresses batches of records (far better ratio than
    * per-record) and stays seekable at sync points. */
  def sequenceFileWrite(df: DataFrame, path: String,
                        codec: Option[String] = None,
                        blockCompress: Boolean = true): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val rdd = df.select(df.columns.take(2).toIndexedSeq.map(c => col(c).cast("string")): _*)
      .as[(String, String)].rdd
    codec match {
      case None => rdd.saveAsSequenceFile(path)
      case Some(name) =>
        import org.apache.hadoop.io.Text
        import org.apache.hadoop.io.compress.CompressionCodec
        val codecClass: Class[_ <: CompressionCodec] = name.toLowerCase match {
          case "gzip" => classOf[org.apache.hadoop.io.compress.GzipCodec]
          case "bzip2" => classOf[org.apache.hadoop.io.compress.BZip2Codec]
          case "deflate" | "default" => classOf[org.apache.hadoop.io.compress.DefaultCodec]
          case other => throw new IllegalArgumentException(
            s"sequenceFileWrite: unsupported codec '$other' (gzip|bzip2|deflate)")
        }
        val jc = new org.apache.hadoop.mapred.JobConf(
          spark.sparkContext.hadoopConfiguration)
        jc.setBoolean("mapreduce.output.fileoutputformat.compress", true)
        jc.set("mapreduce.output.fileoutputformat.compress.type",
          if (blockCompress) "BLOCK" else "RECORD")
        jc.setClass("mapreduce.output.fileoutputformat.compress.codec",
          codecClass, classOf[CompressionCodec])
        rdd.map { case (k, v) => (new Text(k), new Text(v)) }
          .saveAsHadoopFile(path, classOf[Text], classOf[Text],
            classOf[org.apache.hadoop.mapred.SequenceFileOutputFormat[Text, Text]], jc)
    }
  }

  /** Typed write twin of [[sequenceFileAuto]]: the first two columns
    * become key/value with their NATIVE Writable classes (Int →
    * IntWritable, Long → LongWritable, Float/Double/Boolean/Binary/
    * String likewise — the inverse of `writableTypes`), declared in
    * the file header, so a legacy consumer reading with e.g.
    * `IntWritable` keys (the default WordCount output shape) accepts
    * the file as-is; [[sequenceFileWrite]]'s Text/Text cast would make
    * it throw a class mismatch. Null cells fail LOUDLY — numeric
    * Writables have no null notion, and silently writing zeros would
    * corrupt the data. */
  def sequenceFileTypedWrite(df: DataFrame, path: String): Unit = {
    import org.apache.hadoop.io._
    import org.apache.spark.sql.types._
    def writableFor(dt: DataType, colName: String): (Class[_ <: Writable], Any => Writable) =
      dt match {
        case StringType => (classOf[Text], v => new Text(v.asInstanceOf[String]))
        case IntegerType => (classOf[IntWritable], v => new IntWritable(v.asInstanceOf[Int]))
        case LongType => (classOf[LongWritable], v => new LongWritable(v.asInstanceOf[Long]))
        case FloatType => (classOf[FloatWritable], v => new FloatWritable(v.asInstanceOf[Float]))
        case DoubleType => (classOf[DoubleWritable], v => new DoubleWritable(v.asInstanceOf[Double]))
        case BooleanType => (classOf[BooleanWritable], v => new BooleanWritable(v.asInstanceOf[Boolean]))
        case BinaryType => (classOf[BytesWritable], v => new BytesWritable(v.asInstanceOf[Array[Byte]]))
        case other => throw new IllegalArgumentException(
          s"sequenceFileTypedWrite: column '$colName' has no Writable mapping for $other")
      }
    require(df.schema.length >= 2,
      s"sequenceFileTypedWrite: need a key and a value column, got ${df.schema.length} " +
        s"(${df.schema.fieldNames.mkString(", ")})")
    val Seq(kf, vf) = df.schema.fields.take(2).toSeq
    val (kCls, mkK) = writableFor(kf.dataType, kf.name)
    val (vCls, mkV) = writableFor(vf.dataType, vf.name)
    val (kName, vName) = (kf.name, vf.name)
    df.select(col(kName), col(vName)).rdd.map { r =>
      if (r.isNullAt(0) || r.isNullAt(1))
        sys.error(s"sequenceFileTypedWrite: null in '$kName'/'$vName' - " +
          "Writables cannot represent null; filter or fill first")
      (mkK(r.get(0)), mkV(r.get(1)))
    }.saveAsHadoopFile(path, kCls, vCls,
      classOf[org.apache.hadoop.mapred.SequenceFileOutputFormat[Writable, Writable]])
  }

  /** Map-valued SequenceFile writer — the legacy-producer twin of
    * [[sequenceFileAuto]]'s MapWritable read path: first column is the
    * key (Text — the feature-store idiom keys by entity id string;
    * cast upstream), second a `map<string,string>` that becomes a
    * MapWritable of Text→Text entries. A stock Hadoop consumer reading
    * `Text`/`MapWritable` accepts the file as-is. Null keys/maps fail
    * loudly ([[sequenceFileTypedWrite]]'s rule); null map VALUES are
    * skipped (MapWritable has no null Writable). */
  def sequenceFileMapWrite(df: DataFrame, path: String): Unit = {
    import org.apache.hadoop.io._
    require(df.schema.length >= 2, "sequenceFileMapWrite: need key and map columns")
    val Seq(kf, vf) = df.schema.fields.take(2).toSeq
    require(kf.dataType == org.apache.spark.sql.types.StringType,
      s"sequenceFileMapWrite: key column '${kf.name}' must be string, got ${kf.dataType}")
    require(vf.dataType == org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType),
      s"sequenceFileMapWrite: value column '${vf.name}' must be map<string,string>, got ${vf.dataType}")
    val (kName, vName) = (kf.name, vf.name)
    df.select(col(kName), col(vName)).rdd.map { r =>
      if (r.isNullAt(0) || r.isNullAt(1))
        sys.error(s"sequenceFileMapWrite: null in '$kName'/'$vName' - " +
          "Writables cannot represent null; filter or fill first")
      val mw = new MapWritable()
      r.getMap[String, String](1).foreach { case (k, v) =>
        if (v != null) mw.put(new Text(k), new Text(v))
      }
      (new Text(r.getString(0)), mw): (Writable, Writable)
    }.saveAsHadoopFile(path, classOf[Text], classOf[MapWritable],
      classOf[org.apache.hadoop.mapred.SequenceFileOutputFormat[Writable, Writable]])
  }

  /** Array-valued SequenceFile writer: second column
    * `array<string>` → [[TextArrayWritable]] (an ArrayWritable
    * subclass with the no-arg constructor Hadoop's deserializer
    * demands — plain ArrayWritable files are unreadable by Hadoop
    * itself, the classic gotcha). */
  def sequenceFileArrayWrite(df: DataFrame, path: String): Unit = {
    import org.apache.hadoop.io._
    require(df.schema.length >= 2, "sequenceFileArrayWrite: need key and array columns")
    val Seq(kf, vf) = df.schema.fields.take(2).toSeq
    require(kf.dataType == org.apache.spark.sql.types.StringType,
      s"sequenceFileArrayWrite: key column '${kf.name}' must be string, got ${kf.dataType}")
    require(vf.dataType == org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType) ||
      vf.dataType == org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, containsNull = false),
      s"sequenceFileArrayWrite: value column '${vf.name}' must be array<string>, got ${vf.dataType}")
    val (kName, vName) = (kf.name, vf.name)
    df.select(col(kName), col(vName)).rdd.map { r =>
      if (r.isNullAt(0) || r.isNullAt(1))
        sys.error(s"sequenceFileArrayWrite: null in '$kName'/'$vName' - " +
          "Writables cannot represent null; filter or fill first")
      val aw = new TextArrayWritable()
      aw.set(r.getSeq[String](1).map(s => new Text(s): Writable).toArray)
      (new Text(r.getString(0)), aw): (Writable, Writable)
    }.saveAsHadoopFile(path, classOf[Text], classOf[TextArrayWritable],
      classOf[org.apache.hadoop.mapred.SequenceFileOutputFormat[Writable, Writable]])
  }

  /** Member constructor shared by the tagged-union writers: kind →
    * Writable, the three shapes [[UnionWritable]] enumerates. */
  private def unionMember(kind: String, value: String): org.apache.hadoop.io.Writable =
    kind match {
      case "text"   => new Text(value)
      case "long"   => new LongWritable(value.toLong)
      case "double" => new org.apache.hadoop.io.DoubleWritable(value.toDouble)
      case other => sys.error(
        s"union writer: unknown kind '$other' (want text|long|double)")
    }

  private def requireUnionCols(df: DataFrame, who: String): Unit = {
    import org.apache.spark.sql.types.StringType
    require(df.schema.length >= 3, s"$who: need (key, kind, value) string columns")
    df.schema.fields.take(3).foreach(f => require(f.dataType == StringType,
      s"$who: column '${f.name}' must be string, got ${f.dataType}"))
  }

  /** Tagged-union SequenceFile writer, GenericWritable flavor — the
    * legacy-producer twin of [[sequenceFileAuto]]'s union read path:
    * (key, kind, value) string columns → Text key and a
    * [[UnionWritable]] wrapping the kind-selected member (text|long|
    * double). A stock Hadoop consumer reading Text/UnionWritable (with
    * this class on its classpath, the GenericWritable deployment rule)
    * accepts the file as-is. */
  def sequenceFileUnionWrite(df: DataFrame, path: String): Unit = {
    import org.apache.hadoop.io._
    requireUnionCols(df, "sequenceFileUnionWrite")
    df.select(col(df.columns(0)), col(df.columns(1)), col(df.columns(2))).rdd.map { r =>
      if ((0 to 2).exists(r.isNullAt))
        sys.error("sequenceFileUnionWrite: null key/kind/value - " +
          "Writables cannot represent null; filter or fill first")
      val u = new UnionWritable
      u.set(unionMember(r.getString(1), r.getString(2)))
      (new Text(r.getString(0)), u): (Writable, Writable)
    }.saveAsHadoopFile(path, classOf[Text], classOf[UnionWritable],
      classOf[org.apache.hadoop.mapred.SequenceFileOutputFormat[Writable, Writable]])
  }

  /** Tagged-union SequenceFile writer, ObjectWritable flavor: the
    * class-NAME-tagged stream (io/ObjectWritable.java:40 writes each
    * value's declared class as a string — self-describing but fatter
    * than GenericWritable's index byte; no subclass needed on the
    * consumer classpath). Same (key, kind, value) contract. */
  def sequenceFileObjectWrite(df: DataFrame, path: String): Unit = {
    import org.apache.hadoop.io._
    requireUnionCols(df, "sequenceFileObjectWrite")
    df.select(col(df.columns(0)), col(df.columns(1)), col(df.columns(2))).rdd.map { r =>
      if ((0 to 2).exists(r.isNullAt))
        sys.error("sequenceFileObjectWrite: null key/kind/value - " +
          "Writables cannot represent null; filter or fill first")
      val m = unionMember(r.getString(1), r.getString(2))
      (new Text(r.getString(0)), new ObjectWritable(m.getClass, m)): (Writable, Writable)
    }.saveAsHadoopFile(path, classOf[Text], classOf[ObjectWritable],
      classOf[org.apache.hadoop.mapred.SequenceFileOutputFormat[Writable, Writable]])
  }

  /** 2-D array SequenceFile writer: second column `array<array<string>>`
    * → [[TextTwoDArrayWritable]] (subclass rule, see the class doc). */
  def sequenceFileTwoDArrayWrite(df: DataFrame, path: String): Unit = {
    import org.apache.hadoop.io._
    require(df.schema.length >= 2, "sequenceFileTwoDArrayWrite: need key and array columns")
    val (kName, vName) = (df.columns(0), df.columns(1))
    df.select(col(kName), col(vName)).rdd.map { r =>
      if (r.isNullAt(0) || r.isNullAt(1))
        sys.error(s"sequenceFileTwoDArrayWrite: null in '$kName'/'$vName' - " +
          "Writables cannot represent null; filter or fill first")
      val t = new TextTwoDArrayWritable
      t.set(r.getSeq[scala.collection.Seq[String]](1)
        .map(_.map(s => new Text(s): Writable).toArray).toArray)
      (new Text(r.getString(0)), t): (Writable, Writable)
    }.saveAsHadoopFile(path, classOf[Text], classOf[TextTwoDArrayWritable],
      classOf[org.apache.hadoop.mapred.SequenceFileOutputFormat[Writable, Writable]])
  }

  /** Avro container-file reader (the `avro-mapred` surface MapReduce
    * pipelines used before columnar formats — AvroKeyInputFormat over
    * the object-container format). Without the spark-avro connector
    * on the classpath, the schema-dynamic but honest mapping is each
    * record's JSON encoding: one `record` string column, which
    * `from_json` turns into typed columns once the caller states a
    * schema. Splittable: the container format's sync markers make
    * block boundaries seekable, and the input format splits on them. */
  def avroJson(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.newAPIHadoopFile(
        path,
        classOf[org.apache.avro.mapreduce.AvroKeyInputFormat[org.apache.avro.generic.GenericRecord]],
        classOf[org.apache.avro.mapred.AvroKey[org.apache.avro.generic.GenericRecord]],
        classOf[org.apache.hadoop.io.NullWritable],
        new org.apache.hadoop.conf.Configuration(spark.sparkContext.hadoopConfiguration))
      .map(_._1.datum().toString) // GenericRecord renders as JSON
      .toDF("record")
  }

  /** Avro container-file reader with a TYPED nested surface: the
    * writer schema is sniffed from the first container file's header
    * (Avro embeds it — no caller-supplied schema needed, unlike
    * [[avroJson]]+`from_json`), mapped to a Spark schema, and each
    * GenericRecord decoded to a Row. Supported mapping — the shapes
    * the reference's Avro serializer accepts (hadoop-common
    * .../io/serializer/avro/AvroSerialization.java:43 handles
    * arbitrary record schemas): primitives, `[null, T]` unions
    * (→ nullable), enum→string, bytes/fixed→binary, record→struct and
    * array/map at ANY nesting, recursion-capped at [[AvroMaxDepth]]
    * (Avro allows self-referential schemas, which no finite Spark
    * schema can express — those fail loudly pointing at [[avroJson]],
    * which handles anything as JSON strings). Splittable: the
    * container sync markers give block-aligned splits; the sniffed
    * schema is set as the reader schema so mixed-file directories
    * decode uniformly or fail loudly (no silent field drift). */
  def avroStructs(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val conf = new org.apache.hadoop.conf.Configuration(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    // sniff the writer schema from one file header (a few KB read; the
    // alternative — a caller-supplied schema — is exactly the burden
    // the container format exists to remove)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    if (matched.isEmpty)
      throw new java.io.FileNotFoundException(s"avroStructs: no input matches $path")
    val first = matched
      .flatMap(st => if (st.isFile) Seq(st) else fs.listStatus(st.getPath).toSeq.filter(_.isFile))
      .filterNot(_.getPath.getName.startsWith("_")).filter(_.getLen > 0)
      .headOption.getOrElse(throw new java.io.FileNotFoundException(
        s"avroStructs: no non-empty data file under $path"))
    val avroSchema = {
      val in = fs.open(first.getPath)
      try {
        val r = new org.apache.avro.file.DataFileStream(in,
          new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
        try r.getSchema finally r.close()
      } finally { try in.close() catch { case _: Exception => () } }
    }
    require(avroSchema.getType == org.apache.avro.Schema.Type.RECORD,
      s"avroStructs: top-level schema must be a record, got ${avroSchema.getType}")
    def sparkType(s: org.apache.avro.Schema, depth: Int): (DataType, Boolean) = {
      import org.apache.avro.Schema.Type._
      if (depth > AvroMaxDepth) throw new IllegalArgumentException(
        s"avroStructs: schema nests deeper than $AvroMaxDepth (recursive Avro " +
          "schemas have no finite Spark schema) - read via avroJson + from_json instead")
      s.getType match {
        case UNION =>
          val nonNull = s.getTypes.asScala.filterNot(_.getType == NULL)
          require(nonNull.size == 1 && nonNull.size < s.getTypes.size,
            s"avroStructs: only [null, T] unions are supported, got $s")
          (sparkType(nonNull.head, depth)._1, true)
        case STRING | ENUM => (StringType, false)
        case INT => (IntegerType, false)
        case LONG => (LongType, false)
        case FLOAT => (FloatType, false)
        case DOUBLE => (DoubleType, false)
        case BOOLEAN => (BooleanType, false)
        case BYTES | FIXED => (BinaryType, false)
        case RECORD =>
          (StructType(s.getFields.asScala.map { f =>
            val (dt, n) = sparkType(f.schema(), depth + 1)
            StructField(f.name, dt, n)
          }.toSeq), false)
        case ARRAY =>
          val (dt, n) = sparkType(s.getElementType, depth + 1)
          (ArrayType(dt, containsNull = n), false)
        case MAP =>
          val (dt, n) = sparkType(s.getValueType, depth + 1)
          (MapType(StringType, dt, valueContainsNull = n), false)
        case other => throw new IllegalArgumentException(
          s"avroStructs: unsupported Avro type $other in $s - read via avroJson instead")
      }
    }
    val sparkSchema = StructType(avroSchema.getFields.asScala.map { f =>
      val (dt, n) = sparkType(f.schema(), depth = 1)
      StructField(f.name, dt, n)
    }.toSeq)
    val job = org.apache.hadoop.mapreduce.Job.getInstance(conf)
    org.apache.avro.mapreduce.AvroJob.setInputKeySchema(job, avroSchema)
    val nTop = avroSchema.getFields.size
    val rows = spark.sparkContext.newAPIHadoopFile(
        path,
        classOf[org.apache.avro.mapreduce.AvroKeyInputFormat[org.apache.avro.generic.GenericRecord]],
        classOf[org.apache.avro.mapred.AvroKey[org.apache.avro.generic.GenericRecord]],
        classOf[org.apache.hadoop.io.NullWritable],
        job.getConfiguration)
      .map { case (k, _) =>
        val r = k.datum()
        org.apache.spark.sql.Row.fromSeq((0 until nTop).map(i => avroValue(r.get(i))))
      }
    spark.createDataFrame(rows, sparkSchema)
  }

  /** Recursion cap shared by [[avroStructs]] and [[avroWriteNested]]:
    * deep enough for any hand-written schema, finite so a recursive
    * (self-referential) Avro schema fails loudly instead of looping. */
  val AvroMaxDepth = 16

  /** Avro runtime value → Spark row value, by runtime class: Utf8 and
    * enum symbols → String, ByteBuffer/fixed → byte arrays, records →
    * nested Rows (field order = schema order on both sides), avro
    * arrays/maps → Scala collections. Primitives box through as-is. */
  private def avroValue(v: Any): Any = v match {
    case null => null
    case s: CharSequence => s.toString // Utf8 included
    case e: org.apache.avro.generic.GenericEnumSymbol[_] => e.toString
    case b: java.nio.ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case f: org.apache.avro.generic.GenericFixed => f.bytes().clone()
    case r: org.apache.avro.generic.GenericRecord =>
      org.apache.spark.sql.Row.fromSeq(
        (0 until r.getSchema.getFields.size).map(i => avroValue(r.get(i))))
    case c: java.util.Collection[_] =>
      import scala.jdk.CollectionConverters._
      c.asScala.map(avroValue).toSeq
    case m: java.util.Map[_, _] =>
      import scala.jdk.CollectionConverters._
      m.asScala.map { case (k, x) => String.valueOf(k) -> avroValue(x) }.toMap
    case other => other
  }

  /** Avro container-file writer for FLAT schemas: the first-class
    * primitive columns (string/int/long/float/double/boolean) become
    * an Avro record schema derived from the DataFrame schema; nested
    * or exotic types fail LOUDLY — container files with complex
    * schemas should go through a real connector, not a silent
    * stringification. Null cells map to Avro nullable unions. */
  def avroWriteFlat(df: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.types._
    val fields = df.schema.fields
    fields.foreach { f =>
      f.dataType match {
        case StringType | IntegerType | LongType | FloatType | DoubleType | BooleanType => ()
        case other => throw new IllegalArgumentException(
          s"avroWriteFlat: column '${f.name}' has unsupported type $other " +
            "(flat primitives only)")
      }
    }
    avroWriteNested(df, path)
  }

  /** Avro container-file writer for nested schemas — the write twin
    * of [[avroStructs]]: primitive columns plus struct, array and
    * map(string → _) columns at any nesting (capped at
    * [[AvroMaxDepth]], matching the reader) become the corresponding
    * Avro record/array/map schema (every slot a `[null, T]` union —
    * Avro's idiom for nullable). Nested record type names are
    * path-qualified: Avro requires record names to be unique within a
    * schema, so two sibling structs both holding a field `meta` must
    * not collide. */
  def avroWriteNested(df: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.types._
    // names land in interpolated schema JSON — enforce Avro's own
    // lexical rule so the schema parses, and parses to what we meant
    def legal(n: String): Unit =
      if (!n.matches("[A-Za-z_][A-Za-z0-9_]*"))
        throw new IllegalArgumentException(
          s"avroWrite: name '$n' is not a legal Avro name " +
            "([A-Za-z_][A-Za-z0-9_]*); rename before writing")
    def typeJson(pathName: String, dt: DataType, depth: Int): String = {
      if (depth > AvroMaxDepth) throw new IllegalArgumentException(
        s"avroWrite: '$pathName' nests deeper than $AvroMaxDepth levels")
      dt match {
        case StringType => "\"string\""
        case IntegerType => "\"int\""
        case LongType => "\"long\""
        case FloatType => "\"float\""
        case DoubleType => "\"double\""
        case BooleanType => "\"boolean\""
        case BinaryType => "\"bytes\""
        case st: StructType =>
          st.fields.map { f =>
            legal(f.name)
            s"""{"name":"${f.name}","type":["null",${typeJson(s"${pathName}_${f.name}", f.dataType, depth + 1)}]}"""
          }.mkString(s"""{"type":"record","name":"${pathName}_r","fields":[""", ",", "]}")
        case ArrayType(et, _) =>
          s"""{"type":"array","items":["null",${typeJson(s"${pathName}_i", et, depth + 1)}]}"""
        case MapType(StringType, vt, _) =>
          s"""{"type":"map","values":["null",${typeJson(s"${pathName}_v", vt, depth + 1)}]}"""
        case other => throw new IllegalArgumentException(
          s"avroWrite: column '$pathName' has unsupported type $other " +
            "(primitives, struct/array/map)")
      }
    }
    val fields = df.schema.fields
    val schemaJson = fields.map { f =>
        legal(f.name)
        s"""{"name":"${f.name}","type":["null",${typeJson(f.name, f.dataType, depth = 1)}]}"""
      }.mkString("""{"type":"record","name":"row","fields":[""", ",", "]}")
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      new org.apache.hadoop.conf.Configuration(df.sparkSession.sparkContext.hadoopConfiguration))
    org.apache.avro.mapreduce.AvroJob.setOutputKeySchema(job,
      new org.apache.avro.Schema.Parser().parse(schemaJson))
    df.rdd.mapPartitions { it =>
      // one schema parse per TASK, not per record
      val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
      it.map { r =>
        (new org.apache.avro.mapred.AvroKey[org.apache.avro.generic.GenericRecord](
          toAvroRecord(r, schema)),
          org.apache.hadoop.io.NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(
      path,
      classOf[org.apache.avro.mapred.AvroKey[org.apache.avro.generic.GenericRecord]],
      classOf[org.apache.hadoop.io.NullWritable],
      classOf[org.apache.avro.mapreduce.AvroKeyOutputFormat[org.apache.avro.generic.GenericRecord]],
      job.getConfiguration)
  }

  /** Spark Row → GenericRecord following `schema` (field order is
    * schema order on both sides — [[avroWriteNested]] derives the
    * schema from the same StructType the Row came from). */
  private def toAvroRecord(row: org.apache.spark.sql.Row,
                           schema: org.apache.avro.Schema): org.apache.avro.generic.GenericData.Record = {
    import scala.jdk.CollectionConverters._
    def unwrap(s: org.apache.avro.Schema): org.apache.avro.Schema =
      if (s.getType == org.apache.avro.Schema.Type.UNION)
        s.getTypes.asScala.find(_.getType != org.apache.avro.Schema.Type.NULL).get
      else s
    def toAvro(v: Any, s0: org.apache.avro.Schema): Any = {
      if (v == null) null
      else {
        val s = unwrap(s0)
        s.getType match {
          case org.apache.avro.Schema.Type.RECORD =>
            toAvroRecord(v.asInstanceOf[org.apache.spark.sql.Row], s)
          case org.apache.avro.Schema.Type.ARRAY =>
            val seq = v.asInstanceOf[scala.collection.Seq[_]]
            val out = new java.util.ArrayList[Any](seq.size)
            seq.foreach(x => out.add(toAvro(x, s.getElementType)))
            out
          case org.apache.avro.Schema.Type.MAP =>
            val out = new java.util.HashMap[String, Any]()
            v.asInstanceOf[scala.collection.Map[String, _]]
              .foreach { case (k, x) => out.put(k, toAvro(x, s.getValueType)) }
            out
          case org.apache.avro.Schema.Type.BYTES =>
            java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
          case _ => v
        }
      }
    }
    val rec = new org.apache.avro.generic.GenericData.Record(schema)
    schema.getFields.asScala.zipWithIndex.foreach { case (f, i) =>
      rec.put(i, toAvro(row.get(i), f.schema()))
    }
    rec
  }

  /** SequenceFileAsBinaryOutputFormat sink (.../lib/output/
    * SequenceFileAsBinaryOutputFormat.java:39): first two binary
    * columns written as raw BytesWritable key/value — the write twin of
    * [[sequenceFileBinary]], so arbitrary serialized payloads round-trip
    * without a Writable mapping. */
  def sequenceFileBinaryWrite(df: DataFrame, path: String): Unit = {
    val Array(k, v) = df.columns.take(2)
    // BytesWritable has no null notion: null cells write as empty bytes
    // (the constructor would NPE inside a task otherwise)
    def bytes(r: org.apache.spark.sql.Row, i: Int): Array[Byte] = {
      val b = r.getAs[Array[Byte]](i)
      if (b == null) Array.emptyByteArray else b
    }
    df.select(col(k).cast("binary"), col(v).cast("binary"))
      .rdd.map(r => (new BytesWritable(bytes(r, 0)), new BytesWritable(bytes(r, 1))))
      .saveAsSequenceFile(path)
  }

  /** NLineInputFormat capability (.../lib/input/NLineInputFormat.java:63):
    * text where task granularity is N lines per partition. Spark's
    * equivalent knob is a repartition after read.
    *
    * The partition count comes from LISTING metadata plus a bounded
    * (64 KiB) driver-side prefix sample for the average line length —
    * NOT from a `count()` job, which would scan the whole input once
    * just to pick a granularity knob (at 100 TB that doubles the scan;
    * the reference's NLineInputFormat pays the same full read in
    * getSplitsForFile, driver-side). Granularity is approximate — the
    * contract is task SIZE, not an exact per-task line count. Caveat:
    * for compressed inputs the byte/line ratio is measured on
    * compressed bytes, so partitions land coarser by ~the compression
    * ratio. */
  def textNLines(spark: SparkSession, path: String, linesPerPartition: Int): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    // match what spark.read.text(path) will actually read: expand
    // globs (globStatus; getFileStatus throws on a glob literal) and
    // list ONE directory level — read.text does not recurse into
    // nested subdirectories without recursiveFileLookup, so neither
    // does the sizing pass. _SUCCESS/_metadata siblings skipped.
    def leaves(st: org.apache.hadoop.fs.FileStatus): Seq[org.apache.hadoop.fs.FileStatus] =
      if (st.isFile) Seq(st)
      else fs.listStatus(st.getPath).toSeq
        .filterNot(_.getPath.getName.startsWith("_")).filter(_.isFile)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    if (matched.isEmpty)
      throw new java.io.FileNotFoundException(s"textNLines: no input matches $path")
    val files = matched.flatMap(leaves)
    val totalBytes = files.map(_.getLen).sum
    val avgLine = files.find(_.getLen > 0).fold(80.0) { s =>
      val want = math.min(s.getLen, 1L << 16).toInt
      val buf = new Array[Byte](want)
      val in = fs.open(s.getPath)
      try in.readFully(0, buf) finally in.close()
      var nl = buf.count(_ == '\n')
      // a sampled-to-EOF file whose last line lacks a newline still has
      // that line
      if (want.toLong == s.getLen && buf.nonEmpty && buf.last != '\n') nl += 1
      if (nl == 0) want.toDouble else want.toDouble / nl
    }
    val estLines = totalBytes / avgLine
    val n = math.max(1, math.ceil(estLines / math.max(1, linesPerPartition)).toInt)
    spark.read.text(path).repartition(n)
  }
}
