package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO semantics as a batch operator: apply a CDC change batch
  * (insert/update/delete ops) to a base snapshot, producing the next
  * snapshot. The declarative twin of a warehouse `MERGE INTO base
  * USING changes ON key WHEN MATCHED [AND op='D'] THEN DELETE WHEN
  * MATCHED THEN UPDATE WHEN NOT MATCHED [AND op<>'D'] THEN INSERT` —
  * expressed as one compaction window + one full-outer join, so
  * Catalyst plans it as two key shuffles (or one when `changes` is
  * already compacted), broadcast-eligible when the change batch is
  * small, AQE-skew-safe when it is not. No driver loop, no
  * row-at-a-time upserts.
  *
  * Contract: `base` and `changes` share the data columns; `changes`
  * additionally carries `opCol` ('I' | 'U' | 'D' — insert and update
  * are both upserts, the usual CDC degeneracy) and `ordCol` (change
  * order within the batch — log sequence number, commit timestamp).
  * Within one batch only the LATEST change per key applies (the
  * compaction q136 pins); a key whose latest change is 'D' is dropped
  * whether or not it existed in base (delete-of-absent is a no-op,
  * matching MERGE). Ties on `ordCol` are broken by the higher
  * operation wins rule being ill-defined — callers must provide a
  * total order; the op asserts uniqueness loudly rather than pick
  * silently.
  */
object Merge {

  def applyChanges(base: DataFrame, changes: DataFrame,
                   keyCols: Seq[String], opCol: String, ordCol: String): DataFrame = {
    require(keyCols.nonEmpty, "Merge.applyChanges: need at least one key column")
    val dataCols = base.columns.filterNot(keyCols.contains).toSeq
    require(dataCols.forall(changes.columns.contains),
      s"Merge.applyChanges: changes missing data columns " +
        s"${dataCols.filterNot(changes.columns.contains).mkString(", ")}")

    // compact the batch to the latest change per key; max_by over the
    // full struct keeps the row atomically (one partial-agg shuffle).
    // A duplicated ordCol per key would make "latest" nondeterministic
    // — detected via a count carried through the same aggregation, no
    // second scan.
    val chRow = struct((keyCols ++ dataCols :+ opCol).map(col) :+ col(ordCol): _*)
    val latest = changes
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(chRow, struct(col(ordCol))).as("__ch"),
        count(lit(1)).as("__n"),
        countDistinct(col(ordCol)).as("__nord"))
      .select((keyCols.map(k => col(s"__ch.$k").as(k)) ++
        dataCols.map(c => col(s"__ch.$c").as(s"__ch_$c")) :+
        // the guard lives INSIDE the kept op column — a standalone
        // guard column would be pruned (and its raise_error silenced)
        // the moment it is dropped
        when(col("__n") =!= col("__nord"), raise_error(lit(
          s"Merge.applyChanges: duplicate $ordCol within a key's change batch - " +
            "latest-change selection would be nondeterministic")))
          .otherwise(col(s"__ch.$opCol")).as("__op")): _*)

    base.join(latest, keyCols, "full_outer")
      .where(col("__op").isNull || col("__op") =!= "D")
      .select((keyCols.map(col) ++ dataCols.map(c =>
        when(col("__op").isNotNull, col(s"__ch_$c")).otherwise(col(c)).as(c))): _*)
  }
}
