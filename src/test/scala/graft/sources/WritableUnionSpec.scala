package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Pins the tagged-union and 2-D array Writable decode paths — the
  * last SURVEY §1.2 rows: GenericWritable (class-index-tagged,
  * io/GenericWritable.java:80), ObjectWritable (class-name-tagged,
  * io/ObjectWritable.java:40) and TwoDArrayWritable — through the
  * header-dispatched [[CompatSources.sequenceFileAuto]] reader and
  * their legacy-producer writer twins. */
class WritableUnionSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("wunion").toString

  private val mixed = Seq(
    ("d1", "text", "hello"),
    ("d2", "long", "42"),
    ("d3", "double", "2.5"),
    ("d4", "text", "wide record"),
    ("d5", "long", "-7"))

  private val wantTags = Map(
    "d1" -> "org.apache.hadoop.io.Text",
    "d2" -> "org.apache.hadoop.io.LongWritable",
    "d3" -> "org.apache.hadoop.io.DoubleWritable",
    "d4" -> "org.apache.hadoop.io.Text",
    "d5" -> "org.apache.hadoop.io.LongWritable")

  test("GenericWritable union values round-trip as struct<tag,value>") {
    val dir = tmpDir()
    CompatSources.sequenceFileUnionWrite(
      mixed.toDF("k", "kind", "value"), s"$dir/u")
    val part = new java.io.File(s"$dir/u").listFiles()
      .filter(_.getName.startsWith("part-")).head.getPath
    assert(CompatSources.sequenceFileClasses(spark, part) ==
      ("org.apache.hadoop.io.Text", "graft.sources.UnionWritable"))
    val back = CompatSources.sequenceFileAuto(spark, s"$dir/u")
    assert(back.schema("value").dataType ==
      StructType(Seq(StructField("tag", StringType), StructField("value", StringType))))
    val got = back.select(col("key"), col("value.tag"), col("value.value"))
      .as[(String, String, String)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    mixed.foreach { case (k, _, v) =>
      assert(got(k)._1 == wantTags(k), s"$k tag")
      assert(got(k)._2 == v, s"$k value")
    }
  }

  test("ObjectWritable (class-name-tagged) values decode identically") {
    val dir = tmpDir()
    CompatSources.sequenceFileObjectWrite(
      mixed.toDF("k", "kind", "value"), s"$dir/o")
    val part = new java.io.File(s"$dir/o").listFiles()
      .filter(_.getName.startsWith("part-")).head.getPath
    assert(CompatSources.sequenceFileClasses(spark, part)._2 ==
      "org.apache.hadoop.io.ObjectWritable")
    val back = CompatSources.sequenceFileAuto(spark, s"$dir/o")
    val got = back.select(col("key"), col("value.tag"), col("value.value"))
      .as[(String, String, String)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    mixed.foreach { case (k, _, v) =>
      assert(got(k) == ((wantTags(k), v)), s"$k: ${got(k)}")
    }
  }

  test("TwoDArrayWritable values round-trip as array<array<string>>") {
    val dir = tmpDir()
    val src = Seq(
      ("m1", Seq(Seq("a", "b"), Seq("c", "d"))),
      ("m2", Seq(Seq("x"))),
      ("m3", Seq.empty[Seq[String]]))
      .toDF("k", "grid")
    CompatSources.sequenceFileTwoDArrayWrite(src, s"$dir/t")
    val part = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.startsWith("part-")).head.getPath
    assert(CompatSources.sequenceFileClasses(spark, part)._2 ==
      "graft.sources.TextTwoDArrayWritable")
    val back = CompatSources.sequenceFileAuto(spark, s"$dir/t")
    assert(back.schema("value").dataType == ArrayType(ArrayType(StringType)))
    val got = back.select(col("key"), col("value"))
      .as[(String, Seq[Seq[String]])].collect().toSet
    assert(got == Set(
      ("m1", Seq(Seq("a", "b"), Seq("c", "d"))),
      ("m2", Seq(Seq("x"))),
      ("m3", Seq.empty[Seq[String]])))
  }

  test("a legacy hand-written GenericWritable file reads without the writer twin") {
    // stock SequenceFile.Writer + UnionWritable instances — the shape a
    // reference-era producer left behind (no Spark involved in the write)
    import org.apache.hadoop.io.{LongWritable, SequenceFile, Text => HText}
    val dir = tmpDir()
    val p = new org.apache.hadoop.fs.Path(s"$dir/legacy.seq")
    val w = SequenceFile.createWriter(spark.sparkContext.hadoopConfiguration,
      SequenceFile.Writer.file(p),
      SequenceFile.Writer.keyClass(classOf[HText]),
      SequenceFile.Writer.valueClass(classOf[UnionWritable]))
    try {
      val u1 = new UnionWritable; u1.set(new HText("alpha"))
      w.append(new HText("r1"), u1)
      val u2 = new UnionWritable; u2.set(new LongWritable(99L))
      w.append(new HText("r2"), u2)
    } finally w.close()
    val got = CompatSources.sequenceFileAuto(spark, s"$dir/legacy.seq")
      .select(col("key"), col("value.tag"), col("value.value"))
      .as[(String, String, String)].collect().toSet
    assert(got == Set(
      ("r1", "org.apache.hadoop.io.Text", "alpha"),
      ("r2", "org.apache.hadoop.io.LongWritable", "99")))
  }
}
