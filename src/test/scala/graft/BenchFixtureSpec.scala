package graft

import org.apache.spark.sql.functions._

/** Byte-exact parity pin for the [[TagWords]] fixture kernel against
  * the r19 `regexp_replace(text, "(\\S+)", concat("r", rep, "x$1"))`
  * form it replaces: the four x10 bench entries' inputs must be
  * IDENTICAL to r19's or their scale-trend numbers measure a
  * different corpus. */
class BenchFixtureSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox",
    "",
    " ",
    "  leading and  double  gaps trailing ",
    "tabs\tsplit\twords\ttoo",
    "newlines\nare\nseparators",
    "\r vertical formfeed cr",
    "unicode café straße 你好",
    "emoji 😀 run",
    "one",
    "punct!only?  $1 backref-bait \\S")

  test("TagWords is byte-exact with the regexp_replace form") {
    val df = texts.toDF("text")
      .crossJoin(spark.range(10).select(col("id").as("rep")))
    val bad = df.select(
        TagWords(col("text"), col("rep")).as("native"),
        regexp_replace(col("text"), lit("(\\S+)"),
          concat(lit("r"), col("rep"), lit("x$1"))).as("regex"))
      .where(!(col("native") <=> col("regex")))
    assert(bad.count() == 0, bad.collect().take(5).mkString("\n"))
  }

  test("TagWords matches on the fixture corpus itself") {
    val docs = graft.core.Tables.documents(spark, sf).limit(200)
      .crossJoin(spark.range(3).select(col("id").as("rep")))
    val bad = docs.select(
        TagWords(col("text"), col("rep")).as("native"),
        regexp_replace(col("text"), lit("(\\S+)"),
          concat(lit("r"), col("rep"), lit("x$1"))).as("regex"))
      .where(!(col("native") <=> col("regex")))
    assert(bad.count() == 0)
  }

  test("TagWords null text yields null") {
    val df = Seq[(Option[String], Long)]((None, 1L)).toDF("text", "rep")
    assert(df.select(TagWords(col("text"), col("rep"))).head.isNullAt(0))
  }
}
