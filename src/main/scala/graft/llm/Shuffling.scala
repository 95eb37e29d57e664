package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic global shuffle + shard export — the "write the
  * training corpus as N shards in a reproducible random order" step
  * every large-scale training pipeline ends with. The reference's
  * equivalent posture is a total-order sort job over a synthetic key
  * (TeraSort's pipeline shape, `examples/terasort/TeraSort.java`),
  * re-expressed declaratively.
  *
  * Shuffle order is `md5(id) || id` — content-stable (same corpus →
  * same permutation regardless of partitioning, run, or engine),
  * uniform (md5 order is unrelated to ingest order), and unique (the
  * appended id breaks any md5-collision tie deterministically, and
  * the concatenation keeps the sort key a single string both engines
  * order identically, byte-wise).
  *
  * Positions come from [[Packing.packSequences]] with a unit token
  * budget: pack stripes of one token each make `pack_id` the 0-based
  * global position — the same two-phase distributed prefix scan
  * (range-repartition, O(partitions) driver offsets), NEVER a
  * single-partition `row_number()` window, which would collapse
  * 100 TB onto one task. Sharding is round-robin over position, so
  * shard sizes differ by at most one row and every shard samples the
  * whole permutation uniformly (contiguous carving would do too, but
  * round-robin keeps shard boundaries independent of corpus size).
  */
object Shuffling {

  /** Append `pos` (0-based global shuffled position), `shard`
    * (round-robin `pos % numShards`) and `pos_in_shard`
    * (`pos / numShards`, the row's offset inside its shard file).
    * `idCol` must be non-null and unique — [[Packing.packSequences]]
    * fails loudly otherwise. */
  def shard(df: DataFrame, idCol: String, numShards: Int): DataFrame = {
    require(numShards > 0, s"Shuffling.shard: numShards must be positive: $numShards")
    val reserved = Seq("pos", "shard", "pos_in_shard").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"Shuffling.shard: input already has ${reserved.mkString("/")} — the " +
        "output columns would silently shadow them")
    val keyed = df
      .withColumn("__shuf",
        concat(md5(col(idCol).cast("string").cast("binary")), col(idCol).cast("string")))
      .withColumn("__one", lit(1L))
    Packing.packSequences(keyed, "__shuf", "__one", budget = 1L)
      .withColumnRenamed("pack_id", "pos")
      .withColumn("shard", pmod(col("pos"), lit(numShards.toLong)))
      .withColumn("pos_in_shard", expr(s"pos div ${numShards}L"))
      .drop("__shuf", "__one")
  }
}
