package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompatSourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graftsrc").toString

  test("kvText splits at first tab") {
    val dir = tmpDir()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/in.txt"),
      "k1\tv1\nk2\tv2a\tv2b\nnoval\n")
    val out = CompatSources.kvText(spark, s"$dir/in.txt")
      .as[(String, String)].collect().toMap
    assert(out == Map("k1" -> "v1", "k2" -> "v2a\tv2b", "noval" -> ""))
  }

  test("fixedLength reads constant-width binary records") {
    val dir = tmpDir()
    val payload = (0 until 10).flatMap(i => f"rec$i%05d".getBytes("UTF-8")).toArray
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/fixed.bin"), payload)
    val out = CompatSources.fixedLength(spark, s"$dir/fixed.bin", 8)
      .as[Array[Byte]].collect().map(new String(_, "UTF-8")).sorted
    assert(out.length == 10 && out(0) == "rec00000" && out(9) == "rec00009")
  }

  test("sequenceFileText round-trips key/value pairs") {
    val dir = tmpDir()
    val data = (1 to 20).map(i => (s"k$i", s"v$i"))
    spark.sparkContext.parallelize(data, 2).saveAsSequenceFile(s"$dir/seq")
    val out = CompatSources.sequenceFileText(spark, s"$dir/seq")
      .as[(String, String)].collect().toSet
    assert(out == data.toSet)
  }

  test("sequenceFileAuto reads typed numeric Writable keys from the header") {
    import org.apache.hadoop.io.{IntWritable, SequenceFile, Text => HText}
    val dir = tmpDir()
    val conf = spark.sparkContext.hadoopConfiguration
    // written via the Hadoop API directly — the legacy-file shape, no
    // Spark involvement on the write side
    val p = new org.apache.hadoop.fs.Path(s"$dir/typed.seq")
    val w = SequenceFile.createWriter(conf,
      SequenceFile.Writer.file(p),
      SequenceFile.Writer.keyClass(classOf[IntWritable]),
      SequenceFile.Writer.valueClass(classOf[HText]))
    try (1 to 20).foreach(i => w.append(new IntWritable(i), new HText(s"v$i")))
    finally w.close()

    assert(CompatSources.sequenceFileClasses(spark, s"$dir/typed.seq") ==
      ("org.apache.hadoop.io.IntWritable", "org.apache.hadoop.io.Text"))
    val df = CompatSources.sequenceFileAuto(spark, s"$dir/typed.seq")
    import org.apache.spark.sql.types._
    assert(df.schema == StructType(Seq(
      StructField("key", IntegerType), StructField("value", StringType))))
    assert(df.as[(Int, String)].collect().toSet == (1 to 20).map(i => (i, s"v$i")).toSet)
  }

  test("Avro container round-trip; legacy Avro-API files read; nested types loud") {
    import org.apache.spark.sql.functions.{col, from_json}
    val dir = tmpDir()
    // write flat typed rows, read back through the JSON surface
    val df = Seq((1L, "alpha", 0.5, true), (2L, "beta", -1.25, false))
      .toDF("id", "name", "score", "ok")
    CompatSources.avroWriteFlat(df, s"$dir/out")
    val back = CompatSources.avroJson(spark, s"$dir/out")
      .select(from_json(col("record"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "id long, name string, score double, ok boolean")).as("r"))
      .select("r.*").as[(Long, String, Double, Boolean)].collect().toSet
    assert(back == Set((1L, "alpha", 0.5, true), (2L, "beta", -1.25, false)))

    // a file written with the DIRECT Avro API (the legacy shape)
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"kv","fields":[
        |{"name":"k","type":"int"},{"name":"v","type":"string"}]}""".stripMargin)
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, new java.io.File(s"$dir/legacy.avro"))
    try (1 to 5).foreach { i =>
      val rec = new org.apache.avro.generic.GenericData.Record(schema)
      rec.put("k", i); rec.put("v", s"val$i"); w.append(rec)
    } finally w.close()
    val legacy = CompatSources.avroJson(spark, s"$dir/legacy.avro")
      .select(from_json(col("record"),
        org.apache.spark.sql.types.StructType.fromDDL("k int, v string")).as("r"))
      .select("r.*").as[(Int, String)].collect().toSet
    assert(legacy == (1 to 5).map(i => (i, s"val$i")).toSet)

    // nested columns must fail loudly, not stringify silently
    intercept[IllegalArgumentException] {
      CompatSources.avroWriteFlat(
        Seq((1L, Seq("a"))).toDF("id", "arr"), s"$dir/bad")
    }
  }

  test("Avro nested structs round-trip typed at any depth; recursive schemas loud") {
    import org.apache.spark.sql.functions.{col, struct, map_from_arrays, array, lit}
    val dir = tmpDir()
    val df = Seq(
        (1L, ("en", 10), Seq("a", "b"), Map("x" -> 1L)),
        (2L, ("de", 20), Seq("c"), Map("y" -> 2L, "z" -> 3L)))
      .toDF("id", "meta0", "toks", "props")
      .select(col("id"),
        struct(col("meta0._1").as("lang"), col("meta0._2").as("n")).as("meta"),
        col("toks"), col("props"))
    CompatSources.avroWriteNested(df, s"$dir/nested")
    val back = CompatSources.avroStructs(spark, s"$dir/nested")
    // schema came from the FILE header, typed — not JSON strings
    assert(back.schema("meta").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    val rows = back.select(col("id"), col("meta.lang"), col("meta.n"),
        col("toks"), col("props"))
      .as[(Long, String, Int, Seq[String], Map[String, Long])].collect().toSet
    assert(rows == Set(
      (1L, "en", 10, Seq("a", "b"), Map("x" -> 1L)),
      (2L, "de", 20, Seq("c"), Map("y" -> 2L, "z" -> 3L))))

    // null struct cell and null array element survive the round-trip
    val withNulls = Seq(Tuple1(3L)).toDF("id")
      .select(col("id"),
        org.apache.spark.sql.functions.lit(null).cast("struct<lang:string,n:int>").as("meta"),
        array(lit("only"), lit(null).cast("string")).as("toks"),
        lit(null).cast("map<string,bigint>").as("props"))
    CompatSources.avroWriteNested(withNulls, s"$dir/nulls")
    val nback = CompatSources.avroStructs(spark, s"$dir/nulls")
    val r = nback.collect().head
    assert(r.getAs[Any]("meta") == null && r.getAs[Any]("props") == null)
    assert(r.getSeq[String](r.fieldIndex("toks")) == Seq("only", null))

    // a nested file written with the DIRECT Avro API (enum included)
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"doc","fields":[
        |{"name":"id","type":"long"},
        |{"name":"meta","type":{"type":"record","name":"m","fields":[
        |  {"name":"lang","type":{"type":"enum","name":"lg","symbols":["en","de"]}},
        |  {"name":"n","type":"int"}]}},
        |{"name":"toks","type":{"type":"array","items":"string"}}]}""".stripMargin)
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, new java.io.File(s"$dir/legacy_nested.avro"))
    try {
      val meta = new org.apache.avro.generic.GenericData.Record(schema.getField("meta").schema())
      meta.put("lang", new org.apache.avro.generic.GenericData.EnumSymbol(
        schema.getField("meta").schema().getField("lang").schema(), "de"))
      meta.put("n", 7)
      val rec = new org.apache.avro.generic.GenericData.Record(schema)
      rec.put("id", 42L); rec.put("meta", meta)
      rec.put("toks", java.util.Arrays.asList("x", "y"))
      w.append(rec)
    } finally w.close()
    val legacy = CompatSources.avroStructs(spark, s"$dir/legacy_nested.avro")
      .select(col("id"), col("meta.lang"), col("meta.n"), col("toks"))
      .as[(Long, String, Int, Seq[String])].collect().toSet
    assert(legacy == Set((42L, "de", 7, Seq("x", "y"))))

    // deeper nesting round-trips too (struct in struct, and a
    // direct-API three-level record) — the reference's serializer
    // takes arbitrary record schemas, so the typed surface must not
    // stop at one level
    CompatSources.avroWriteNested(
      df.select(struct(struct(col("meta")).as("inner"), col("id").as("tag")).as("outer")),
      s"$dir/deep_w")
    val deepBack = CompatSources.avroStructs(spark, s"$dir/deep_w")
      .select(col("outer.inner.meta.lang"), col("outer.inner.meta.n"), col("outer.tag"))
      .as[(String, Int, Long)].collect().toSet
    assert(deepBack == Set(("en", 10, 1L), ("de", 20, 2L)), deepBack)
    val deep = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"o","fields":[{"name":"a","type":
        |{"type":"record","name":"b","fields":[{"name":"c","type":
        |{"type":"record","name":"d","fields":[{"name":"e","type":"int"}]}}]}}]}""".stripMargin)
    val w2 = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](deep))
    w2.create(deep, new java.io.File(s"$dir/deep.avro"))
    try {
      val d3 = new org.apache.avro.generic.GenericData.Record(deep.getField("a").schema().getField("c").schema())
      d3.put("e", 1)
      val d2 = new org.apache.avro.generic.GenericData.Record(deep.getField("a").schema())
      d2.put("c", d3)
      val d1 = new org.apache.avro.generic.GenericData.Record(deep)
      d1.put("a", d2)
      w2.append(d1)
    } finally w2.close()
    val threeDeep = CompatSources.avroStructs(spark, s"$dir/deep.avro")
      .select(col("a.c.e")).as[Int].collect().toSeq
    assert(threeDeep == Seq(1), threeDeep)

    // a RECURSIVE schema (self-referential list node) has no finite
    // Spark schema — the depth cap must reject it loudly, not loop
    val recursive = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"node","fields":[
        |{"name":"v","type":"int"},
        |{"name":"next","type":["null","node"]}]}""".stripMargin)
    val w3 = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](recursive))
    w3.create(recursive, new java.io.File(s"$dir/rec.avro"))
    try {
      val n1 = new org.apache.avro.generic.GenericData.Record(recursive)
      n1.put("v", 1); n1.put("next", null)
      w3.append(n1)
    } finally w3.close()
    val e = intercept[IllegalArgumentException] {
      CompatSources.avroStructs(spark, s"$dir/rec.avro")
    }
    assert(e.getMessage.contains("nests deeper"), e.getMessage)
  }

  test("sequenceFileTypedWrite declares native Writable classes in the header") {
    val dir = tmpDir()
    // Int keys, Double values — the shape sequenceFileWrite's
    // Text/Text cast can NOT produce for a typed legacy consumer
    val df = Seq((7, 0.5), (8, 1.25), (9, -3.0)).toDF("k", "v")
    CompatSources.sequenceFileTypedWrite(df, s"$dir/typed_out")
    val part = new java.io.File(s"$dir/typed_out").listFiles()
      .filter(_.getName.startsWith("part-")).head.getPath
    assert(CompatSources.sequenceFileClasses(spark, part) ==
      ("org.apache.hadoop.io.IntWritable", "org.apache.hadoop.io.DoubleWritable"))
    // a legacy Hadoop-API reader with typed Writables accepts the file
    import org.apache.hadoop.io.{DoubleWritable, IntWritable, SequenceFile}
    val r = new SequenceFile.Reader(spark.sparkContext.hadoopConfiguration,
      SequenceFile.Reader.file(new org.apache.hadoop.fs.Path(part)))
    val seen = scala.collection.mutable.Set.empty[(Int, Double)]
    try {
      val k = new IntWritable(); val v = new DoubleWritable()
      while (r.next(k, v)) seen += ((k.get, v.get))
    } finally r.close()
    assert(seen.nonEmpty && seen.subsetOf(Set((7, 0.5), (8, 1.25), (9, -3.0))))
    // and the auto reader round-trips the full set with types intact
    val back = CompatSources.sequenceFileAuto(spark, s"$dir/typed_out")
    assert(back.schema.map(_.dataType) ==
      Seq(org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.DoubleType))
    assert(back.as[(Int, Double)].collect().toSet == Set((7, 0.5), (8, 1.25), (9, -3.0)))
    // nulls fail loudly instead of writing zeros
    val withNull = Seq((Some(1), "a"), (None, "b"))
      .toDF("k", "v").selectExpr("cast(k as int) k", "v")
    val err = intercept[org.apache.spark.SparkException] {
      CompatSources.sequenceFileTypedWrite(withNull, s"$dir/null_out")
    }
    assert(err.getMessage.contains("null") ||
      Option(err.getCause).exists(_.getMessage.contains("null")))
  }

  test("sequenceFileAuto: Long/Double pairs, NullWritable key drops its column") {
    import org.apache.hadoop.io.{DoubleWritable, LongWritable, NullWritable, SequenceFile}
    val dir = tmpDir()
    val conf = spark.sparkContext.hadoopConfiguration
    val p1 = new org.apache.hadoop.fs.Path(s"$dir/ld.seq")
    val w1 = SequenceFile.createWriter(conf, SequenceFile.Writer.file(p1),
      SequenceFile.Writer.keyClass(classOf[LongWritable]),
      SequenceFile.Writer.valueClass(classOf[DoubleWritable]))
    try (1 to 5).foreach(i => w1.append(new LongWritable(i * 10L), new DoubleWritable(i / 2.0)))
    finally w1.close()
    val ld = CompatSources.sequenceFileAuto(spark, s"$dir/ld.seq")
      .as[(Long, Double)].collect().toSet
    assert(ld == (1 to 5).map(i => (i * 10L, i / 2.0)).toSet)

    val p2 = new org.apache.hadoop.fs.Path(s"$dir/nv.seq")
    val w2 = SequenceFile.createWriter(conf, SequenceFile.Writer.file(p2),
      SequenceFile.Writer.keyClass(classOf[NullWritable]),
      SequenceFile.Writer.valueClass(classOf[LongWritable]))
    try (1 to 5).foreach(i => w2.append(NullWritable.get(), new LongWritable(i)))
    finally w2.close()
    val nv = CompatSources.sequenceFileAuto(spark, s"$dir/nv.seq")
    assert(nv.columns.toSeq == Seq("value"))
    assert(nv.as[Long].collect().toSet == (1L to 5L).toSet)
  }

  test("sequenceFileAuto fails loudly on an unmapped Writable class") {
    // MapWritable graduated to a real mapping (map<string,string>), so
    // the unmapped example is now VIntWritable — a Writable with no
    // sane column type (its width is per-value)
    import org.apache.hadoop.io.{NullWritable, SequenceFile, VIntWritable}
    val dir = tmpDir()
    val p = new org.apache.hadoop.fs.Path(s"$dir/vint.seq")
    val w = SequenceFile.createWriter(spark.sparkContext.hadoopConfiguration,
      SequenceFile.Writer.file(p),
      SequenceFile.Writer.keyClass(classOf[NullWritable]),
      SequenceFile.Writer.valueClass(classOf[VIntWritable]))
    try w.append(NullWritable.get(), new VIntWritable(7))
    finally w.close()
    val e = intercept[IllegalArgumentException] {
      CompatSources.sequenceFileAuto(spark, s"$dir/vint.seq")
    }
    assert(e.getMessage.contains("VIntWritable"))
  }

  test("kvTextWrite emits key TAB value lines readable by kvText") {
    val dir = tmpDir()
    val df = Seq(("k1", "v1"), ("k2", "v2")).toDF("k", "v")
    CompatSources.kvTextWrite(df, s"$dir/out")
    val back = CompatSources.kvText(spark, s"$dir/out")
      .as[(String, String)].collect().toSet
    assert(back == Set("k1" -> "v1", "k2" -> "v2"))
  }

  test("kvTextWrite with bzip2 codec actually compresses and round-trips") {
    val dir = tmpDir()
    val df = Seq(("k1", "v1"), ("k2", "v2"), ("k3", "")).toDF("k", "v")
    CompatSources.kvTextWrite(df, s"$dir/out", codec = Some("bzip2"))
    // the parts must really be compressed, not just renamed
    val parts = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getName)
    assert(parts.nonEmpty && parts.forall(_.endsWith(".bz2")), parts.toSeq)
    val back = CompatSources.kvText(spark, s"$dir/out")
      .as[(String, String)].collect().toSet
    assert(back == Set("k1" -> "v1", "k2" -> "v2", "k3" -> ""))
  }

  test("sequenceFileWrite round-trips through sequenceFileText") {
    val dir = tmpDir()
    val df = Seq(("a", "1"), ("b", "2")).toDF("k", "v")
    CompatSources.sequenceFileWrite(df, s"$dir/seq")
    val back = CompatSources.sequenceFileText(spark, s"$dir/seq")
      .as[(String, String)].collect().toSet
    assert(back == Set("a" -> "1", "b" -> "2"))
  }

  test("sequenceFileWrite block-gzip layout really compresses and round-trips") {
    val dir = tmpDir()
    val df = (1 to 50).map(i => (s"k$i", "v" * 100)).toDF("k", "v")
    CompatSources.sequenceFileWrite(df, s"$dir/seq", codec = Some("gzip"))
    // the container must really be block-compressed with the gzip codec
    val part = new java.io.File(s"$dir/seq").listFiles()
      .filter(_.getName.startsWith("part-")).head
    val conf = spark.sparkContext.hadoopConfiguration
    val reader = new org.apache.hadoop.io.SequenceFile.Reader(conf,
      org.apache.hadoop.io.SequenceFile.Reader.file(
        new org.apache.hadoop.fs.Path(part.getPath)))
    try {
      assert(reader.isBlockCompressed, "expected BLOCK compression")
      assert(reader.getCompressionCodec.isInstanceOf[
        org.apache.hadoop.io.compress.GzipCodec], reader.getCompressionCodec)
    } finally reader.close()
    val back = CompatSources.sequenceFileText(spark, s"$dir/seq")
      .as[(String, String)].collect().toSet
    assert(back == (1 to 50).map(i => (s"k$i", "v" * 100)).toSet)
  }

  test("sequenceFileWrite record-compressed layout round-trips too") {
    val dir = tmpDir()
    val df = Seq(("a", "1"), ("b", "2")).toDF("k", "v")
    CompatSources.sequenceFileWrite(df, s"$dir/seq", codec = Some("deflate"),
      blockCompress = false)
    val part = new java.io.File(s"$dir/seq").listFiles()
      .filter(_.getName.startsWith("part-")).head
    val conf = spark.sparkContext.hadoopConfiguration
    val reader = new org.apache.hadoop.io.SequenceFile.Reader(conf,
      org.apache.hadoop.io.SequenceFile.Reader.file(
        new org.apache.hadoop.fs.Path(part.getPath)))
    try assert(reader.isCompressed && !reader.isBlockCompressed)
    finally reader.close()
    val back = CompatSources.sequenceFileText(spark, s"$dir/seq")
      .as[(String, String)].collect().toSet
    assert(back == Set("a" -> "1", "b" -> "2"))
  }

  test("sequenceFileBinary round-trips arbitrary bytes (incl. empty and high-bit)") {
    val dir = tmpDir()
    val data: Seq[(Array[Byte], Array[Byte])] = Seq(
      ("k1".getBytes("UTF-8"), Array[Byte](0, 1, -1, 127, -128)),
      ("k2".getBytes("UTF-8"), Array.emptyByteArray),
      (Array[Byte](-1, -2), (0 until 1000).map(_.toByte).toArray))
    val df = data.toDF("key", "value")
    CompatSources.sequenceFileBinaryWrite(df, s"$dir/seqbin")
    val back = CompatSources.sequenceFileBinary(spark, s"$dir/seqbin")
      .as[(Array[Byte], Array[Byte])].collect()
      .map { case (k, v) => (k.toSeq, v.toSeq) }.toSet
    assert(back == data.map { case (k, v) => (k.toSeq, v.toSeq) }.toSet)
    // and the file is a genuine SequenceFile (sniffable magic)
    assert(CompatSources.sniffFormat(spark, s"$dir/seqbin") == "sequencefile")
  }

  test("many small files bin-pack into few splits (CombineFileInputFormat posture)") {
    // CombineFileInputFormat (.../lib/input/CombineFileInputFormat.java:84)
    // packs small files into shared splits so task count tracks bytes,
    // not file count. Spark's scan does the same bin-packing via
    // maxPartitionBytes + openCostInBytes — prove it holds: 200 tiny
    // files must not become 200 partitions.
    val dir = tmpDir()
    (0 until 200).foreach { i =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/f$i.txt"), s"line_$i\n")
    }
    val scanned = spark.read.text(dir)
    assert(scanned.count() == 200)
    val parts = scanned.rdd.getNumPartitions
    assert(parts <= 16, s"200 small files produced $parts partitions")
  }

  test("textNLines controls partition granularity without a count() pass") {
    val dir = tmpDir()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/lines.txt"),
      (1 to 100).map(i => s"line$i").mkString("\n"))
    // constructing the frame must launch NO Spark job (the old
    // implementation ran a full count() scan to pick the granularity)
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    val df = try {
      val d = CompatSources.textNLines(spark, s"$dir/lines.txt", 10)
      Thread.sleep(300) // listener events are delivered asynchronously
      d
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs == 0, s"textNLines launched $jobs jobs during construction")
    assert(df.rdd.getNumPartitions == 10)
    assert(df.count() == 100)
  }

  test("textNLines accepts globs and nested directories like spark.read.text") {
    val dir = tmpDir()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/sub"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/a.txt"),
      (1 to 40).map(i => s"a$i").mkString("\n"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/b.txt"),
      (1 to 40).map(i => s"b$i").mkString("\n"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/sub/c.txt"),
      (1 to 20).map(i => s"c$i").mkString("\n"))
    // glob over the flat files
    val g = CompatSources.textNLines(spark, s"$dir/*.txt", 10)
    assert(g.count() == 80)
    assert(g.rdd.getNumPartitions == 8, s"got ${g.rdd.getNumPartitions}")
    // directory root: estimate must include the nested file so the
    // partition count matches what spark.read.text actually reads
    val d = CompatSources.textNLines(spark, s"$dir/sub", 10)
    assert(d.count() == 20 && d.rdd.getNumPartitions == 2)
    intercept[java.io.FileNotFoundException] {
      CompatSources.textNLines(spark, s"$dir/missing*.txt", 10)
    }
  }
}

class MultimodalSpec extends SparkSpec {

  lazy val media = Multimodal.asMedia(
    graft.core.Tables.documents(spark, sf), "doc_id", "text", "image")

  test("asMedia produces the canonical media schema") {
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "media_type", "payload", "meta"))
    assert(media.count() > 0)
  }

  test("stub decode is deterministic and in range") {
    val d1 = Multimodal.extractFeatures(media).select("media_id", "decoded", "features")
    val d2 = Multimodal.extractFeatures(media).select("media_id", "decoded", "features")
    assert(d1.except(d2).count() == 0)
    val bad = d1.where(col("decoded.width") < 1 || col("decoded.width") > 1920 ||
      col("decoded.height") < 1 || col("decoded.height") > 1080).count()
    assert(bad == 0)
    assert(d1.select(size(col("features"))).distinct().head.getInt(0) == 8)
  }

  test("frame sampling emits one frame per interval") {
    import spark.implicits._
    val df = Seq((1L, Array[Byte](1, 2, 3), 5000L)).toDF("id", "payload", "dur")
    val frames = df.select(explode(
      Multimodal.frameSampleStub(col("payload"), col("dur"), 1000)).as("f"))
    assert(frames.count() == 5)
  }

  test("batched kernel preserves order, one feature row per payload") {
    val out = Multimodal.extractFeaturesBatched(media, batchSize = 7)()
    assert(out.count() == media.count())
    assert(out.where(size(col("features")) =!= 8).count() == 0)
    // deterministic across runs
    assert(out.except(Multimodal.extractFeaturesBatched(media, batchSize = 13)()).count() == 0)
  }

  test("batched kernel rejects a kernel that drops rows") {
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeaturesBatched(media, batchSize = 4)(_.take(1).map(_ => Array(0.0)))
        .count()
    }
    assert(ex.getMessage.contains("one feature row per payload") ||
      Option(ex.getCause).exists(_.getMessage.contains("one feature row per payload")))
  }
}

class XmlAndSniffSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graftxml").toString

  test("xmlRecords extracts tag-delimited records across files") {
    val dir = java.nio.file.Files.createTempDirectory("xml").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/a.xml"),
      "<root><doc id=\"1\">one</doc>junk<doc id=\"2\">two</doc></root>")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/b.xml"),
      "<root><doc id=\"3\">three</doc></root>")
    val recs = CompatSources.xmlRecords(spark, s"$dir/*.xml", "doc")
      .as[String].collect().sorted
    assert(recs.length == 3)
    assert(recs.forall(r => r.startsWith("<doc") && r.endsWith("</doc>")))
  }

  test("xmlRecords does not prefix-match longer tag names") {
    val dir = tmpDir()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/c.xml"),
      "<items><item>a</item><item>b</item></items>")
    val recs = CompatSources.xmlRecords(spark, s"$dir/c.xml", "item")
      .as[String].collect().sorted
    assert(recs.toSeq == Seq("<item>a</item>", "<item>b</item>"), recs.toSeq)
  }

  test("xmlRecordsStreamed agrees with xmlRecords and splits one large file") {
    val dir = tmpDir()
    // one "large" file with many records, multiline bodies, junk
    // between elements, and a decoy longer tag name
    val recs = (1 to 500).map(i => s"""<doc id="$i">line1\nline2 $i</doc>""")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/big.xml"),
      "<docs>\n" + recs.mkString("\n junk \n") + "\n</docs>")
    val streamed = CompatSources.xmlRecordsStreamed(spark, s"$dir/big.xml", "doc")
      .as[String].collect().sorted
    val whole = CompatSources.xmlRecords(spark, s"$dir/big.xml", "doc")
      .as[String].collect().sorted
    assert(streamed.length == 500)
    assert(streamed.toSeq == whole.toSeq)
    // force multiple splits over the same file: records must survive
    // split boundaries (the delimiter-reader contract)
    val conf = spark.sparkContext.hadoopConfiguration
    val prev = conf.get("mapreduce.input.fileinputformat.split.maxsize")
    conf.set("mapreduce.input.fileinputformat.split.maxsize", "2048")
    try {
      val split = CompatSources.xmlRecordsStreamed(spark, s"$dir/big.xml", "doc")
        .as[String].collect().sorted
      assert(split.toSeq == whole.toSeq)
    } finally {
      if (prev == null) conf.unset("mapreduce.input.fileinputformat.split.maxsize")
      else conf.set("mapreduce.input.fileinputformat.split.maxsize", prev)
    }
  }

  test("sniffFormat detects parquet, sequencefile, and text") {
    val dir = java.nio.file.Files.createTempDirectory("sniff").toString
    graft.core.Tables.nation(spark, sf).write.parquet(s"$dir/p")
    spark.sparkContext.parallelize(Seq(("k", "v")), 1).saveAsSequenceFile(s"$dir/s")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/t.txt"), "hello\n")
    assert(CompatSources.sniffFormat(spark, s"$dir/p") == "parquet")
    assert(CompatSources.sniffFormat(spark, s"$dir/s") == "sequencefile")
    assert(CompatSources.sniffFormat(spark, s"$dir/t.txt") == "text")
  }

  test("MapWritable values round-trip to map<string,string> via the header") {
    import org.apache.spark.sql.functions.{col, lit, map}
    val dir = tmpDir()
    val src = Seq((1L, "en", 120L), (2L, "fr", 45L), (3L, "en", 7L))
      .toDF("doc_id", "lang", "n_chars")
      .select(col("doc_id").cast("string").as("k"),
        map(lit("lang"), col("lang"),
          lit("n_chars"), col("n_chars").cast("string")).as("m"))
    CompatSources.sequenceFileMapWrite(src, s"$dir/m")
    val part = new java.io.File(s"$dir/m").listFiles()
      .filter(_.getName.startsWith("part-")).head.getPath
    assert(CompatSources.sequenceFileClasses(spark, part) ==
      ("org.apache.hadoop.io.Text", "org.apache.hadoop.io.MapWritable"))
    val back = CompatSources.sequenceFileAuto(spark, s"$dir/m")
    import org.apache.spark.sql.types._
    assert(back.schema("value").dataType == MapType(StringType, StringType))
    val got = back.select(col("key").cast("long"),
        col("value").getItem("lang"), col("value").getItem("n_chars").cast("long"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "en", 120L), (2L, "fr", 45L), (3L, "en", 7L)))
  }

  test("heterogeneous MapWritable entries (legacy-written) stringify per entry") {
    // the reference's MapWritable is Writable→Writable per ENTRY — a
    // legacy feature store mixes Text and numeric values in one map
    import org.apache.hadoop.io.{IntWritable, MapWritable, SequenceFile, Text => HText}
    val dir = tmpDir()
    val p = new org.apache.hadoop.fs.Path(s"$dir/het.seq")
    val w = SequenceFile.createWriter(spark.sparkContext.hadoopConfiguration,
      SequenceFile.Writer.file(p),
      SequenceFile.Writer.keyClass(classOf[HText]),
      SequenceFile.Writer.valueClass(classOf[MapWritable]))
    try {
      val m = new MapWritable()
      m.put(new HText("name"), new HText("alpha"))
      m.put(new HText("count"), new IntWritable(42))
      w.append(new HText("r1"), m)
    } finally w.close()
    val back = CompatSources.sequenceFileAuto(spark, s"$dir/het.seq")
    val row = back.collect().head
    val m = row.getMap[String, String](1)
    assert(row.getString(0) == "r1" && m("name") == "alpha" && m("count") == "42")
  }

  test("ArrayWritable-subclass values round-trip to array<string>") {
    import org.apache.spark.sql.functions.col
    val dir = tmpDir()
    val src = Seq(("a", Seq("x", "y")), ("b", Seq.empty[String]), ("c", Seq("z")))
      .toDF("k", "tags")
    CompatSources.sequenceFileArrayWrite(src, s"$dir/a")
    val part = new java.io.File(s"$dir/a").listFiles()
      .filter(_.getName.startsWith("part-")).head.getPath
    assert(CompatSources.sequenceFileClasses(spark, part)._2 ==
      "graft.sources.TextArrayWritable")
    val back = CompatSources.sequenceFileAuto(spark, s"$dir/a")
    import org.apache.spark.sql.types._
    assert(back.schema("value").dataType.isInstanceOf[ArrayType])
    val got = back.select(col("key"), col("value"))
      .as[(String, Seq[String])].collect().toSet
    assert(got == Set(("a", Seq("x", "y")), ("b", Seq.empty[String]), ("c", Seq("z"))))
  }
}
