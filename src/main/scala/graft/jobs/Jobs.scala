package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** The reference's canonical example jobs as reusable DataFrame
  * transforms (EX/WordCount, EX/Grep.java:40, EX/WordMean.java:41,
  * EX/AggregateWordCount.java:41, EX/QuasiMonteCarlo.java:78 in
  * hadoop-mapreduce-examples). The declared queries q03/q14/q15 are
  * these same transforms applied to the fixture tables.
  */
object Jobs {

  /** WordCount: tokenize + count, descending. */
  def wordCount(df: DataFrame, textCol: Column, lowercase: Boolean = true): DataFrame = {
    val t = if (lowercase) lower(textCol) else textCol
    df.select(explode(TextFunctions.tokens(t)).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
  }

  /** Grep: count every regex match occurrence, sort by count desc —
    * the two chained jobs of EX/Grep.java:40 collapse into one plan. */
  def grep(df: DataFrame, textCol: Column, pattern: String): DataFrame =
    df.select(explode(regexp_extract_all(textCol, lit(pattern), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word"))

  /** Word-length statistics in one pass (WordMean / WordMedian /
    * WordStandardDeviation were three separate jobs in the reference). */
  def wordStats(df: DataFrame, textCol: Column): DataFrame =
    df.select(explode(TextFunctions.tokens(textCol)).as("w"))
      .where(col("w") =!= "")
      .agg(
        round(avg(length(col("w"))), 4).as("mean_len"),
        round(expr("percentile(length(w), 0.5)"), 4).as("median_len"),
        round(stddev_pop(length(col("w"))), 4).as("stddev_len"),
        count(lit(1)).as("n_words"))

  /** Deterministic π estimate by midpoint quadrature on a g×g grid —
    * the map-only embarrassingly-parallel compute shape of
    * QuasiMonteCarlo, with the randomness removed so it is
    * oracle-checkable (q15). */
  def piEstimate(spark: org.apache.spark.sql.SparkSession, gridSize: Int = 1000): DataFrame = {
    val n = gridSize.toLong * gridSize
    val x = ((col("id") % gridSize).cast("double") + 0.5) / gridSize.toDouble
    val y = (floor(col("id") / gridSize).cast("double") + 0.5) / gridSize.toDouble
    spark.range(n)
      .select(when(x * x + y * y <= 1.0, 1).otherwise(0).as("inside"))
      .agg(round(lit(4.0) * sum(col("inside")) / n.toDouble, 4).as("pi_est"))
  }
}
