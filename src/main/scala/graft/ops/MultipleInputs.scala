package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Heterogeneous-source union — the capability of `MultipleInputs` /
  * `DelegatingInputFormat` / `DelegatingMapper`
  * (.../lib/input/MultipleInputs.java:40): each input path gets its own
  * format and its own per-source mapper, then all records flow into one
  * job.
  *
  * Declaratively: per-source load + per-source projection, then
  * `unionByName(allowMissingColumns = true)` — schema alignment by
  * name, missing columns null, no shuffle.
  */
object MultipleInputs {

  /** Union of (loader, per-source transform) pairs. */
  def union(sources: Seq[(DataFrame, DataFrame => DataFrame)]): DataFrame =
    sources.map { case (df, f) => f(df) }
      .reduceLeft((a, b) => a.unionByName(b, allowMissingColumns = true))
}
