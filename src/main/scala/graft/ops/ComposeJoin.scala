package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-way join builders mirroring the reference's join DSL
  * (`mapreduce.join.expr` — CompositeInputFormat.java:56,93-95 and the
  * recursive-descent Parser.java:75 in
  * hadoop-mapreduce-client-core/.../lib/join/): `inner(...)`,
  * `outer(...)` and `override(...)` over N key-aligned inputs.
  *
  * The reference requires all inputs to be identically partitioned AND
  * sorted on disk (it merges file streams). Declaratively, these are
  * just N-way equi-joins: Catalyst plans broadcast/shuffled-hash/
  * sort-merge per side statistics, and pre-bucketed tables still get
  * the shuffle-free merge (`spark.sql.sources.bucketing.enabled`), so
  * the on-disk-layout contract becomes an optimization, not a
  * prerequisite.
  */
object ComposeJoin {

  /** inner(a, b, c…): key present in every input
    * (InnerJoinRecordReader.java:34). */
  def inner(key: String, dfs: Seq[DataFrame]): DataFrame =
    dfs.reduceLeft((l, r) => l.join(r, Seq(key), "inner"))

  /** outer(a, b, c…): key present in any input, missing slots null
    * (OuterJoinRecordReader.java:34). */
  def outer(key: String, dfs: Seq[DataFrame]): DataFrame =
    dfs.reduceLeft((l, r) => l.join(r, Seq(key), "full_outer"))

  /** override(a, b, c…): per key, the row from the RIGHTMOST input
    * that has the key wins (OverrideRecordReader.java:42) — priority
    * union / config layering. Presence is tracked with a marker, not
    * value nullness: a null VALUE in a higher-priority input still
    * overrides (coalesce on values would silently ignore null-valued
    * overrides). All inputs must share the same schema.
    */
  def overrideJoin(key: String, dfs: Seq[DataFrame]): DataFrame = {
    val valueCols = dfs.head.columns.filterNot(_ == key).toSeq
    dfs.reduceLeft { (l, r) =>
      val joined = l.alias("l")
        .join(r.withColumn("__present", lit(true)).alias("r"), Seq(key), "full_outer")
      joined.select(col(key) +: valueCols.map(c =>
        when(col("r.__present").isNotNull, col(s"r.$c"))
          .otherwise(col(s"l.$c")).as(c)): _*)
    }
  }
}
