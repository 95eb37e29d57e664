package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k: global (the Grep idiom — the reference's only route was a
  * single-reducer job, EX/Grep.java:40) and per-group (a hand-written
  * secondary-sort + counting reducer in the reference).
  *
  * Global top-k compiles to `TakeOrderedAndProject` (per-partition
  * heaps, k rows to the driver). Per-group top-k is one shuffle on the
  * group keys + `row_number` — AQE runs the rank as a partial top-k
  * per partition, so no group ever materializes fully.
  */
object TopK {

  def global(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Top `k` rows per group, ranked by `order` (include a unique
    * tiebreaker for determinism). Adds a `rank` column. */
  def perGroup(df: DataFrame, groupCols: Seq[String], k: Int,
               order: Column*): DataFrame = {
    require(!df.columns.contains("rank"), "input already has a rank column")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
