package graft.ops

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Reduce-side tagged join — the hadoop-datajoin contract
  * (TOOLS/hadoop-datajoin/.../DataJoinReducerBase.java:47): rows from N
  * sources are tagged with their origin, shuffled on the join key, and
  * per key the values are re-grouped by tag; the operator then walks
  * the CROSS PRODUCT over the tag groups and hands every tuple to a
  * user `combine` that may transform or reject it (arbitrary per-key
  * theta logic — not restricted to equi-join output shapes).
  *
  * Spark-first mapping: the tagged union is a `Dataset[(K, tag, V)]`,
  * the shuffle+regroup is `groupByKey(..).flatMapGroups` (Catalyst
  * plans the exchange; there is deliberately no SQL-join rewrite here
  * because `combine` is a black box — when the logic IS expressible as
  * an equi-join, use a real join and let Catalyst pick broadcast/SMJ).
  *
  * Scale posture: one shuffle on the key; per-key memory is bounded by
  * `maxValuesPerKey` exactly like the reference's
  * `datajoin.maxNumOfValuesPerGroup` (default 100 there and here) —
  * values past the cap within one key are dropped, which also caps the
  * cross-product fan-out at maxValuesPerKey^sources per key. Raise it
  * (or pre-aggregate per tag) when keys are known to be small.
  */
object DataJoin {

  /** Mirror of `datajoin.maxNumOfValuesPerGroup`'s default. */
  val DefaultMaxValuesPerKey = 100L

  /** Per-key tagged cross-product combine. `combine` receives the tag
    * list (sorted, like the reference's TreeMap regroup) and one value
    * per tag; returning None drops the tuple (the reference's
    * `combine(...) == null` filtering path). */
  def taggedJoin[K: Encoder, V, OUT: Encoder](
      tagged: Dataset[(K, String, V)],
      maxValuesPerKey: Long = DefaultMaxValuesPerKey)(
      combine: (K, IndexedSeq[String], IndexedSeq[V]) => Option[OUT]): Dataset[OUT] =
    tagged.groupByKey(_._1).flatMapGroups { (key, it) =>
      // regroup by tag with the value cap (reference regroup():
      // values past the cap are skipped, the count keeps running)
      val groups = mutable.TreeMap.empty[String, mutable.ArrayBuffer[V]]
      var numOfValues = 0L
      it.foreach { case (_, tag, v) =>
        numOfValues += 1
        if (numOfValues <= maxValuesPerKey)
          groups.getOrElseUpdate(tag, mutable.ArrayBuffer.empty[V]) += v
      }
      val tags = groups.keysIterator.toIndexedSeq
      val lists = tags.map(groups(_))
      val current = new Array[Any](tags.length)
      val out = mutable.ArrayBuffer.empty[OUT]
      // joinAndCollect's recursion (DataJoinReducerBase.java:199):
      // one value from each tag group per emitted tuple
      def walk(pos: Int): Unit =
        if (pos == tags.length) {
          combine(key, tags,
            current.toIndexedSeq.asInstanceOf[IndexedSeq[V]]).foreach(out += _)
        } else {
          lists(pos).foreach { v => current(pos) = v; walk(pos + 1) }
        }
      if (tags.nonEmpty) walk(0)
      out.iterator
    }

  /** Build the tagged union from per-source frames: each row becomes
    * (key, tag, line) where `line` is the tab-joined remaining columns
    * — the reference's Text-record idiom (TaggedMapOutput over
    * delimited lines). Null fields serialize as empty (concat_ws would
    * drop them and shift the layout).
    *
    * Precondition: payload fields must not CONTAIN tabs — a tab inside
    * a field shifts the split-based layout downstream (innerCombine
    * tab-joins again), exactly as in the reference's delimited-Text
    * records. For tab-bearing data use [[taggedJoin]] directly with
    * typed tuples (it imposes no line encoding), or
    * [[graft.ops.Pipe.pipeMapJson]]-style JSON framing. */
  def taggedLines(sources: Seq[(String, DataFrame)], keyCol: String): Dataset[(String, String, String)] = {
    require(sources.nonEmpty, "at least one tagged source required")
    val spark = sources.head._2.sparkSession
    import spark.implicits._
    sources.map { case (tag, df) =>
      val payload = df.columns.filter(_ != keyCol).toSeq
      df.select(
        col(keyCol).cast("string").as("key"),
        lit(tag).as("tag"),
        concat_ws("\t", payload.map(c => coalesce(col(c).cast("string"), lit(""))): _*).as("value"))
    }.reduce(_ unionByName _).as[(String, String, String)]
  }

  /** Inner-join combine (the SampleDataJoin shape): emit the tuple only
    * when every expected source contributed, as key + tab-joined
    * values in tag order. */
  def innerCombine(expectedTags: Int): (String, IndexedSeq[String], IndexedSeq[String]) => Option[String] =
    (key, tags, values) =>
      if (tags.length == expectedTags) Some((key +: values).mkString("\t")) else None
}
