package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Token-budget sequence packing — the batching step of a training
  * pipeline: walk the corpus in a stable order and assign each
  * document to a consecutive "pack" of roughly `budget` tokens, so
  * downstream training reads contiguous, budget-sized batches.
  *
  * A document's pack is the budget stripe its STARTING token offset
  * falls in: `pack_id = floor(prefix_sum_exclusive(tokens) / budget)`.
  * Documents are never split; a pack can therefore overflow by at
  * most one document's tokens (callers chunk oversized documents
  * first if hard caps matter).
  *
  * The prefix sum is the classic two-phase distributed scan, NOT a
  * single-partition window (`Window.orderBy` with no partition key
  * collapses the corpus onto one task — the straggler this module
  * exists to avoid): range-repartition on the order key, one pass for
  * per-partition token totals (O(partitions) to the driver), then a
  * second pass that seeds each partition with the exclusive sum of
  * every partition before it. Range partitions are emitted in key
  * order, so partition index order IS global order.
  */
object Packing {

  /** Append `pack_id` to `df`, packing in `orderCol` order (must be
    * unique — ties would make the walk order, and thus pack
    * boundaries, nondeterministic) with per-pack token budget
    * `budget` read from integer column `tokCol`.
    *
    * The range-partitioned input is persisted between the two passes;
    * the cache block is released by the ContextCleaner when the
    * returned frame is garbage-collected (same lifecycle contract as
    * `Dedup.minHashCandidates`). */
  def packSequences(df: DataFrame, orderCol: String, tokCol: String,
                    budget: Long, numPartitions: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
                else spark.sessionState.conf.numShufflePartitions
    val arranged = df.repartitionByRange(parts, col(orderCol))
      .sortWithinPartitions(orderCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tokAt = arranged.schema.fieldIndex(tokCol)
    def tokOf(r: Row): Long = {
      val t = r.get(tokAt) match {
        case i: Int => i.toLong
        case l: Long => l
        case s: Short => s.toLong
        case other => sys.error(s"$tokCol must be integral, got $other")
      }
      if (t < 0) sys.error(s"negative token count in $tokCol: $t")
      t
    }

    // pass 1: per-partition token totals (partition count rows).
    // Duplicate order keys would make pack boundaries depend on tie
    // placement — range partitioning puts equal keys in ONE partition
    // and the sort makes them adjacent, so this pass can check
    // uniqueness completely for free.
    val keyAt = arranged.schema.fieldIndex(orderCol)
    val partSums = arranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      var prev: Any = null
      it.foreach { r =>
        if (r.isNullAt(keyAt))
          sys.error(s"packSequences: null $orderCol value - the walk needs a total order")
        val k = r.get(keyAt)
        if (prev != null && prev == k)
          sys.error(s"packSequences: duplicate $orderCol value '$k' - " +
            "the walk order would be nondeterministic; use a unique key")
        prev = k
        s += tokOf(r)
      }
      Iterator.single(pid -> s)
    }.collect().toMap

    // exclusive prefix over partitions: what every earlier partition
    // contributes to this partition's starting offset
    val nParts = arranged.rdd.getNumPartitions
    val offsets = new Array[Long](nParts)
    var acc = 0L
    for (pid <- 0 until nParts) {
      offsets(pid) = acc
      acc += partSums.getOrElse(pid, 0L)
    }
    val bcOffsets = spark.sparkContext.broadcast(offsets)

    // pass 2 (reads the cached partitions): running offset -> stripe
    val withPack = arranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = bcOffsets.value(pid)
      it.map { r =>
        val start = run
        run += tokOf(r)
        Row.fromSeq(r.toSeq :+ start / budget)
      }
    }
    spark.createDataFrame(withPack, arranged.schema.add("pack_id", LongType))
  }
}
