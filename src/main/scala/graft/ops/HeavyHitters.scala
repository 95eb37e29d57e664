package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Heavy hitters by sketch-then-verify — the streaming-classic
  * Misra-Gries summary run distributed, then an EXACT second pass
  * over just the candidates. The guarantee that makes this safe at
  * 100 TB: a merged Misra-Gries summary of size `k` undercounts any
  * key by at most n/k, so every key with true count > n/k SURVIVES
  * the sketch — phase 2's exact counts then discard the false
  * candidates, and the final answer is exactly
  * `{key | count(key) · k > n}`, independent of sketch luck. (Same
  * prefilter-then-exact shape as `Decontamination.overlapFlagsBloom`:
  * the sketch changes the plan, not the answer.)
  *
  * Phase 1 is a `treeAggregate` over the key column — per-partition
  * size-k summaries merged pairwise (O(k log k) each, driver sees
  * one) — which also carries the exact row count, so the total needs
  * no extra scan; phase 2 filters the scan to the ≤k candidate keys
  * (an `isin` pushed to the source) and counts them exactly. Nothing
  * larger than k entries ever leaves an executor, and the input is
  * read exactly twice.
  */
object HeavyHitters {

  // Injective key encoding: "v" + value, "n" for null — a sentinel
  // VALUE (any fixed string) could collide with real data and pool
  // two keys' counts; a reserved PREFIX cannot.
  private val NULL_KEY = "n"
  private def encode(raw: String): String = if (raw == null) NULL_KEY else "v" + raw

  /** Misra-Gries add: bump a tracked key or claim a free slot; on a
    * full summary, decrement IN PLACE by the tracked minimum and
    * discard the arrival — the classic ≤ n/k undercount trade.
    * Decrementing by the minimum (≥ 1) rather than 1 guarantees every
    * full-summary scan frees at least one slot, so the next untracked
    * key claims a slot in O(1) instead of triggering another O(k)
    * scan — on high-cardinality data the scans amortize against the
    * slots they free instead of running per arrival. The bound is
    * unchanged: a scan removes k·dec + 1 mass, so Σ dec ≤ n/k, and
    * any key's undercount ≤ Σ dec ≤ n/k (the same subtract-a-cut
    * argument [[merge]] already relies on). (private[ops] so the
    * survival guarantee is property-testable without Spark jobs.) */
  private[ops] def add(m: mutable.Map[String, Long], key: String, k: Int) = {
    if (m.contains(key) || m.size < k) { m(key) = m.getOrElse(key, 0L) + 1L; m }
    else {
      val dec = m.valuesIterator.min
      m.filterInPlace((_, v) => v > dec)
      m.mapValuesInPlace((_, v) => v - dec)
      m
    }
  }

  /** Merge: sum counters; if over k entries, subtract the (k+1)-th
    * largest value from all and keep the positive ones — preserves
    * the ≤ n/k bound for merged summaries (Agarwal et al., PODS'12,
    * "Mergeable summaries"). */
  private[ops] def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long], k: Int) = {
    b.foreach { case (kk, v) => a(kk) = a.getOrElse(kk, 0L) + v }
    if (a.size <= k) a
    else {
      val cut = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val out = mutable.Map.empty[String, Long]
      a.foreach { case (kk, v) => if (v - cut > 0L) out(kk) = v - cut }
      out
    }
  }

  /** Phase 1 as a reusable unit: the distributed size-k summary and
    * the exact row count of `df`, one pass. */
  private def summarize(df: DataFrame, keyCol: String,
                        k: Int): (mutable.Map[String, Long], Long) = {
    val kk = k
    val keys = df.select(col(keyCol).cast("string")).rdd
      .map(r => encode(if (r.isNullAt(0)) null else r.getString(0)))
    // summary and exact row count in ONE pass
    keys.treeAggregate((mutable.Map.empty[String, Long], 0L))(
      { case ((m, n), key) => (add(m, key, kk), n + 1L) },
      { case ((ma, na), (mb, nb)) => (merge(ma, mb, kk), na + nb) })
  }

  /** Streaming leg: a running Misra-Gries summary folded across
    * micro-batches (use [[StreamingSummary.ingest]] as the
    * `foreachBatch` body). Each batch runs the same distributed
    * phase-1 treeAggregate; the running state merges via [[merge]],
    * so the mergeable-summaries bound (Agarwal et al., PODS'12)
    * spans the WHOLE stream: any key's undercount ≤ n/k over
    * everything ingested, hence every key with true count > n/k is
    * tracked. There is no exact second pass here — the history is
    * gone, which is exactly why the batch op re-verifies and this
    * one documents the error bound instead. Driver state is O(k)
    * regardless of stream length; parity with the batch guarantee is
    * pinned by StreamingHeavyHittersSpec. */
  final class StreamingSummary(keyCol: String, k: Int) {
    require(k >= 2, s"HeavyHitters: k must be >= 2: $k")
    // var, not in-place: merge returns a REBUILT map when the cut
    // fires (over-k shrink), so the result must be reassigned
    private var state = mutable.Map.empty[String, Long]
    private var n = 0L
    /** foreachBatch body: fold one micro-batch into the summary. */
    def ingest(batch: DataFrame): Unit = this.synchronized {
      val (s, t) = summarize(batch, keyCol, k)
      state = merge(state, s, k)
      n += t
    }
    def total: Long = this.synchronized(n)
    /** Tracked candidates with their (undercount ≤ total/k)
      * estimates; the encoded null bucket decodes to None. */
    def candidates: Map[Option[String], Long] = this.synchronized {
      state.map { case (ek, v) =>
        (if (ek == NULL_KEY) Option.empty[String] else Some(ek.substring(1))) -> v
      }.toMap
    }
  }

  /** Keys whose count strictly exceeds total/k, with exact counts.
    * Output: keyCol (as string), cnt. Null keys participate like any
    * other value (prefix-encoded internally — injective, so a data
    * value can never pool with the null bucket — and reported as
    * null). */
  def exactOverThreshold(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 2, s"HeavyHitters: k must be >= 2: $k")
    val (summary, total) = summarize(df, keyCol, k)
    val candidates = summary.keys.toSeq

    val spark = df.sparkSession
    if (candidates.isEmpty) {
      import org.apache.spark.sql.types._
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField(keyCol, StringType), StructField("cnt", LongType))))
    }
    // phase 2: exact counts for the candidate sliver only. The isin
    // list is ≤ k entries — k is a SUMMARY size (hundreds/thousands),
    // so the predicate stays a sane in-filter the scan can evaluate.
    df.select(when(col(keyCol).isNull, lit(NULL_KEY))
        .otherwise(concat(lit("v"), col(keyCol).cast("string"))).as("__k"))
      .where(col("__k").isin(candidates: _*))
      .groupBy(col("__k")).agg(count(lit(1)).as("cnt"))
      // cnt > total/k in integer form ⟺ cnt·k > total (for q=total/k,
      // r=total mod k: cnt ≥ q+1 ⟺ cnt·k ≥ total - r + k > total) —
      // but never overflows where cnt·k could past Long.MaxValue/k
      .where(col("cnt") > lit(total / k))
      .select(when(col("__k") === NULL_KEY, lit(null).cast("string"))
          .otherwise(expr("substring(__k, 2)")).as(keyCol),
        col("cnt"))
  }
}
