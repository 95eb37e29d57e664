package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Sink-side routing — the capabilities of `MultipleOutputs`
  * (.../lib/output/MultipleOutputs.java:186) and
  * `MultipleTextOutputFormat.generateFileNameForKeyValue`
  * (.../mapred/lib/MultipleOutputFormat.java:56,144): route records to
  * outputs derived from their content, and emit several named outputs
  * from one job.
  */
object Outputs {

  /** Key-derived output routing: one directory per value of
    * `routeCol` — `MultipleTextOutputFormat`'s layout, natively
    * `partitionBy` (and at read time the route column becomes a
    * partition-pruning column, which the reference never had). */
  def routedByColumn(df: DataFrame, path: String, routeCol: String,
                     format: String = "parquet"): Unit =
    df.write.mode(SaveMode.Overwrite).format(format)
      .partitionBy(routeCol).save(path)

  /** Named side-outputs from one pass: cache the source once, write
    * each named projection/filter. (One job, N sinks — MultipleOutputs'
    * contract; the cache replaces the reference's shared task context.) */
  def sideOutputs(df: DataFrame, outputs: Map[String, DataFrame => DataFrame],
                  basePath: String, format: String = "parquet"): Unit = {
    val cached = df.persist()
    try outputs.foreach { case (name, f) =>
      f(cached).write.mode(SaveMode.Overwrite).format(format).save(s"$basePath/$name")
    } finally cached.unpersist()
  }

  /** maxRecordsPerFile knob (TeraOutputFormat/NLineInputFormat-style
    * output granularity control). */
  def withMaxRecordsPerFile(df: DataFrame, path: String, maxRecords: Long,
                            format: String = "parquet"): Unit =
    df.write.mode(SaveMode.Overwrite).option("maxRecordsPerFile", maxRecords)
      .format(format).save(path)
}
