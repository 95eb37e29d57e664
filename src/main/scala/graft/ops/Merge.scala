package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *
  * [[applyChangesStream]] is the Structured Streaming leg: the same
  * semantics over a CHANGE STREAM, maintained as a versioned parquet
  * snapshot via foreachBatch.
  */
object Merge {

  /** The latest change per key (keys ++ data ++ opCol ++ ordCol, one
    * row per key), with the duplicate-`ordCol` guard riding inside the
    * kept op column — a standalone guard column would be pruned (and
    * its raise_error silenced) the moment it is dropped. Shared by the
    * batch and streaming apply paths. */
  def compactLatest(changes: DataFrame, keyCols: Seq[String], opCol: String,
                    ordCol: String, dataCols: Seq[String]): DataFrame = {
    val chRow = struct((keyCols ++ dataCols :+ opCol).map(col) :+ col(ordCol): _*)
    changes
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(chRow, struct(col(ordCol))).as("__ch"),
        count(lit(1)).as("__n"),
        countDistinct(col(ordCol)).as("__nord"))
      .select((keyCols.map(k => col(s"__ch.$k").as(k)) ++
        dataCols.map(c => col(s"__ch.$c").as(c)) :+
        when(col("__n") =!= col("__nord"), raise_error(lit(
          s"Merge: duplicate $ordCol within a key's change batch - " +
            "latest-change selection would be nondeterministic")))
          .otherwise(col(s"__ch.$opCol")).as(opCol) :+
        col(s"__ch.$ordCol").as(ordCol)): _*)
  }

  def applyChanges(base: DataFrame, changes: DataFrame,
                   keyCols: Seq[String], opCol: String, ordCol: String): DataFrame = {
    require(keyCols.nonEmpty, "Merge.applyChanges: need at least one key column")
    val dataCols = base.columns.filterNot(keyCols.contains).toSeq
    require(dataCols.forall(changes.columns.contains),
      s"Merge.applyChanges: changes missing data columns " +
        s"${dataCols.filterNot(changes.columns.contains).mkString(", ")}")

    val latest = compactLatest(changes, keyCols, opCol, ordCol, dataCols)
      .select((keyCols.map(col) ++
        dataCols.map(c => col(c).as(s"__ch_$c")) :+
        col(opCol).as("__op")): _*)

    base.join(latest, keyCols, "full_outer")
      .where(col("__op").isNull || col("__op") =!= "D")
      .select((keyCols.map(col) ++ dataCols.map(c =>
        when(col("__op").isNotNull, col(s"__ch_$c")).otherwise(col(c)).as(c))): _*)
  }

  // ---- streaming leg -------------------------------------------------

  /** Internal snapshot representation: data rows plus `__op` ('U'
    * live, 'D' tombstone) and `__ord` (order of the last applied
    * change; base rows carry Long.MinValue, i.e. "older than any
    * change"). Tombstones and per-key order are RETAINED so that a
    * late or replayed micro-batch delivering an older change for a key
    * (including a stale upsert after a delete) is ignored — which is
    * exactly what makes the stream-applied snapshot equal the batch
    * [[applyChanges]] of all batches concatenated, for ANY
    * interleaving of ords across batches. At 100 TB, tombstones for
    * keys whose `__ord` precedes the upstream log's trim point can be
    * compacted away offline; the op itself never needs unbounded
    * history — one row per key ever seen. */
  private def internalize(base: DataFrame, keyCols: Seq[String],
                          dataCols: Seq[String]): DataFrame =
    base.select((keyCols ++ dataCols).map(col): _*)
      .withColumn("__op", lit("U"))
      .withColumn("__ord", lit(Long.MinValue))

  /** One micro-batch step: stored rows and the compacted batch meet in
    * one max_by-per-key aggregate. A re-delivery of the ALREADY APPLIED
    * change (same `__ord`, same content) is absorbed idempotently; a
    * same-`__ord` arrival with DIFFERENT content raises loudly — the
    * cross-batch twin of [[compactLatest]]'s duplicate-ordCol guard,
    * without which the stream would silently pick a side where the
    * batch path errors (the documented parity would break exactly when
    * the upstream log is buggy). Detection: the per-key winner
    * preferring the incoming side vs preferring the stored side — if
    * both hold the same `__ord` but differ in content, the order is
    * nondeterministic. The guard rides inside the kept `__op` column
    * (the compactLatest pruning lesson). */
  private def applyOnce(prevInternal: DataFrame, batch: DataFrame,
                        keyCols: Seq[String], opCol: String, ordCol: String,
                        dataCols: Seq[String]): DataFrame = {
    val incoming = compactLatest(batch, keyCols, opCol, ordCol, dataCols)
      .select((keyCols ++ dataCols).map(col) :+
        col(opCol).as("__op") :+
        col(ordCol).cast("long").as("__ord"): _*)
      .withColumn("__src", lit(1))
    val merged = prevInternal.withColumn("__src", lit(0))
      .unionByName(incoming)
    val row = struct((keyCols ++ dataCols ++ Seq("__op", "__ord")).map(col): _*)
    def content(r: String) =
      struct(dataCols.map(c => col(s"$r.$c")) :+ col(s"$r.__op"): _*)
    val conflict = col("__r.__ord") === col("__r2.__ord") &&
      !(content("__r") <=> content("__r2"))
    merged.groupBy(keyCols.map(col): _*)
      .agg(max_by(row, struct(col("__ord"), col("__src"))).as("__r"),
        max_by(row, struct(col("__ord"), -col("__src"))).as("__r2"))
      .select((keyCols ++ dataCols).map(c => col(s"__r.$c").as(c)) :+
        when(conflict, raise_error(lit(
          s"Merge: conflicting changes share one $ordCol across batches - " +
            "apply order would be nondeterministic")))
          .otherwise(col("__r.__op")).as("__op") :+
        col("__r.__ord").as("__ord"): _*)
  }

  /** Committed versions preferred: a directory counts once its
    * `_SUCCESS` marker exists, so a reader never observes a version a
    * concurrent (or replayed) `mode("overwrite")` write has deleted
    * but not finished rewriting — it falls back to the previous
    * committed version instead. Deployments that DISABLE success
    * markers (`mapreduce.fileoutputcommitter.marksuccessfuljobs=
    * false`, common with cloud committers) would see zero markers
    * anywhere; in that case every version dir counts, preserving the
    * pre-gating behavior rather than hiding all committed data. */
  private def versions(spark: SparkSession, dir: String): Seq[(Long, String)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val all = fs.listStatus(p).filter(_.isDirectory).map(_.getPath).toSeq
      .flatMap { q =>
        if (q.getName.startsWith("v"))
          q.getName.drop(1).toLongOption.map(v => (v, q.toString,
            fs.exists(new org.apache.hadoop.fs.Path(q, "_SUCCESS"))))
        else None
      }
    val committed = all.filter(_._3)
    (if (committed.nonEmpty) committed else all)
      .map { case (v, path, _) => (v, path) }.sortBy(_._1)
  }

  /** Maintain a MERGE'd snapshot from a STREAM of change rows — the
    * streaming twin of [[applyChanges]], closing the CDC loop: batch
    * semantics, micro-batch cadence. Micro-batch `b` reads snapshot
    * version `v(b-1)` (or `base` for the first), applies the batch's
    * compacted changes, and writes `snapshotDir/v<b>` — an IDEMPOTENT
    * function of (previous version, replayed batch), so
    * foreachBatch's at-least-once replay after a failure rewrites the
    * same version rather than double-applying (the exactly-once
    * recipe for deterministic sinks). `ordCol` must cast to long and
    * exceed Long.MinValue. Returns the started query; read the live
    * table with [[snapshot]]. Pass a fresh `checkpointDir` per
    * snapshot lineage — batch ids must start at 0. */
  def applyChangesStream(changes: DataFrame, base: DataFrame,
                         keyCols: Seq[String], opCol: String, ordCol: String,
                         snapshotDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(keyCols.nonEmpty, "Merge.applyChangesStream: need at least one key column")
    val dataCols = base.columns.filterNot(keyCols.contains).toSeq
    val spark = base.sparkSession
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val prev =
          if (batchId == 0) internalize(base, keyCols, dataCols)
          else spark.read.parquet(s"$snapshotDir/v${batchId - 1}")
        applyOnce(prev, batch, keyCols, opCol, ordCol, dataCols)
          .write.mode("overwrite").parquet(s"$snapshotDir/v$batchId")
        ()
      }
      .start()
  }

  /** The current visible table under `snapshotDir`: latest version,
    * tombstones and bookkeeping columns dropped. */
  def snapshot(spark: SparkSession, snapshotDir: String): DataFrame = {
    val vs = versions(spark, snapshotDir)
    require(vs.nonEmpty, s"Merge.snapshot: no versions under $snapshotDir")
    spark.read.parquet(vs.last._2)
      .where(col("__op") =!= "D")
      .drop("__op", "__ord")
  }
}
