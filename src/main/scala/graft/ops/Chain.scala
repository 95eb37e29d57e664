package graft.ops

import org.apache.spark.sql.DataFrame

/** Chained per-record pipelines — the capability of
  * `ChainMapper`/`ChainReducer` (.../lib/chain/ChainMapper.java:84,
  * Chain.java:50: an `M+ R M*` pipeline inside one job, avoiding
  * intermediate HDFS writes).
  *
  * In a lazy declarative engine this is the native composition model:
  * every link is a `DataFrame => DataFrame`, the whole chain is ONE
  * Catalyst plan (Project/Filter collapse merges adjacent links), and
  * nothing materializes between links — the reference's "byref/byvalue
  * passing" concern disappears entirely.
  */
object Chain {
  def apply(df: DataFrame)(links: (DataFrame => DataFrame)*): DataFrame =
    links.foldLeft(df)((d, f) => d.transform(f))
}
