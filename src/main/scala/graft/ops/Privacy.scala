package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity audit — the privacy gate a dataset passes before
  * release: every combination of quasi-identifier values must be
  * shared by at least `k` rows, or the rows in that equivalence class
  * are re-identifiable by linking the quasi-identifiers to an outside
  * source (Sweeney, "k-anonymity: a model for protecting privacy",
  * 2002). The audit reports the VIOLATING classes — the thing a
  * release pipeline suppresses or generalizes.
  *
  * Scale shape: one partial-aggregated shuffle on the quasi-identifier
  * tuple (a count per class, map-side combined); the violation filter
  * runs on the aggregated — already small — side. Null quasi values
  * form their own class (NULL links as well as any value does).
  */
object Privacy {

  /** Equivalence classes with fewer than `k` members:
    * (quasi columns..., n), the suppression work-list. */
  def kAnonymityViolations(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymityViolations: need at least one quasi-identifier")
    require(k >= 2, s"kAnonymityViolations: k must be >= 2: $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .where(col("n") < k)
  }

  /** The audit summary a gate actually checks: total classes,
    * violating classes, rows at risk, and the dataset's achieved k
    * (the smallest class size — the dataset IS min_class_size-
    * anonymous). One aggregation over the class counts. */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymityReport: need at least one quasi-identifier")
    require(k >= 2, s"kAnonymityReport: k must be >= 2: $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("n_violating"),
        sum(when(col("n") < k, col("n")).otherwise(lit(0L))).as("rows_at_risk"),
        min(col("n")).as("achieved_k"))
  }
}
