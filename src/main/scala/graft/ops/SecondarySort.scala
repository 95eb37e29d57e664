package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Row}
import org.apache.spark.sql.functions.col

/** Secondary sort: iterate each key group with its values in a
  * caller-chosen order, without buffering a whole key group on the
  * driver and without a global sort.
  *
  * The reference needs three cooperating pieces for this
  * (EX/SecondarySort.java:51: `FirstPartitioner`, a composite-key sort
  * comparator via Job.setSortComparatorClass, and a grouping comparator
  * via Job.setGroupingComparatorClass — Job.java:1038,1053). In Spark
  * the same contract is `repartition(groupKey)` — one group never spans
  * partitions — then `sortWithinPartitions(groupKey, sortKeys…)`, then
  * a partition-local adjacent-group iterator. No shuffle beyond the one
  * hash repartition; no per-group memory beyond what `f` itself holds
  * (the Iterator is single-pass, like the reference's value iterator).
  */
object SecondarySort {

  /** Apply `f(key, sortedValues)` per group. `sortCols` may include
    * `.desc` columns. The values iterator is single-pass and must be
    * consumed before the next group is requested. */
  def groupedSorted[K, R: Encoder](
      df: DataFrame,
      groupCol: String,
      sortCols: Seq[org.apache.spark.sql.Column],
      numPartitions: Int)(
      key: Row => K, f: (K, Iterator[Row]) => Iterator[R]): Dataset[R] = {
    val arranged = df
      .repartition(numPartitions, col(groupCol))
      .sortWithinPartitions(col(groupCol) +: sortCols: _*)
    arranged.mapPartitions { it =>
      new GroupedIterator(it, (r: Row) => key(r)).flatMap { case (k, vs) => f(k, vs) }
    }
  }

  /** Adjacent-key grouping over a partition-sorted iterator. Exposes
    * each group as a lazy sub-iterator; if the consumer abandons a
    * group early, the remainder is drained automatically (the
    * mark/reset `BackupStore` of ReduceContextImpl.java:184 is not
    * needed because Spark re-sorts spills, not us). */
  final class GroupedIterator[K, T](it: Iterator[T], keyOf: T => K)
      extends Iterator[(K, Iterator[T])] {
    private val in = it.buffered
    private var current: Iterator[T] = Iterator.empty

    override def hasNext: Boolean = { drain(); in.hasNext }

    override def next(): (K, Iterator[T]) = {
      drain()
      val k = keyOf(in.head)
      val group = new Iterator[T] {
        override def hasNext: Boolean = in.hasNext && keyOf(in.head) == k
        override def next(): T = { if (!hasNext) throw new NoSuchElementException; in.next() }
      }
      current = group
      (k, group)
    }

    private def drain(): Unit = while (current.hasNext) current.next()
  }
}
