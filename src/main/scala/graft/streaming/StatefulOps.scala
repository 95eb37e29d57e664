package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Arbitrary per-key streaming state via `flatMapGroupsWithState` —
  * the Structured Streaming surface the north star declares beyond
  * windowed aggregation (SURVEY.md §2.10). The state object is the
  * engine's replacement for the reference's reduce-side mutable
  * context; unlike a Reducer it survives across micro-batches and is
  * evicted by timeout, so memory is bounded at scale.
  */
object StatefulOps {

  case class Event(ts: Timestamp, userId: Long, value: Double)
  case class SessionState(n: Long, sum: Double, lastTs: Long)
  case class SessionOut(userId: Long, n: Long, sum: Double)

  /** Emit a session summary when a user goes quiet for `gapMs`
    * (processing-time timeout flavor of q18's sessionization — state
    * lives only until the timeout fires). */
  def sessionSummaries(events: Dataset[Event], gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.n, s.sum))
          } else {
            val evs = batch.toSeq
            val prev = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
            val next = SessionState(
              prev.n + evs.size, prev.sum + evs.map(_.value).sum,
              math.max(prev.lastTs, evs.map(_.ts.getTime).maxOption.getOrElse(0L)))
            state.update(next)
            state.setTimeoutDuration(gapMs)
            Iterator.empty
          }
      }
  }

  /** Streaming exact dedup: emit only the FIRST record seen for each
    * `keyOf` value (typically a content hash — md5 of the normalized
    * text), dropping later duplicates both within a micro-batch and
    * across batches. Per-key state is one timestamp, evicted `ttlMs`
    * after the key last appeared — the memory bound that makes exact
    * dedup viable on an unbounded stream. The contract is therefore
    * TTL-windowed: a duplicate arriving more than `ttlMs` after its
    * original re-emits (same shape as Spark's
    * `dropDuplicatesWithinWatermark`, but keyed on arbitrary content
    * and evicted on processing time, so it needs no event-time
    * column). Each duplicate ALSO refreshes the TTL, so a
    * continuously-reposted document stays suppressed. */
  def dedupFirst[T](ds: Dataset[T], keyOf: T => String, ttlMs: Long)(
      implicit enc: org.apache.spark.sql.Encoder[T]): Dataset[T] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(keyOf)
      .flatMapGroupsWithState[Long, T](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (_: String, batch: Iterator[T], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = if (state.exists) Iterator.empty[T]
                      else Iterator.single(batch.next())
            state.update(System.currentTimeMillis())
            state.setTimeoutDuration(ttlMs)
            out
          }
      }
  }

  /** Event-time streaming dedup via Spark's own
    * `dropDuplicatesWithinWatermark`: keep the first arrival per key,
    * with per-key state evicted once the watermark passes `delay`
    * behind the max seen event time — the bounded-memory contract
    * [[dedupFirst]] provides with processing-time TTL, here tied to
    * EVENT time so replaying an out-of-order-but-bounded stream
    * suppresses the same duplicates. Works on a streaming Dataset;
    * on a batch Dataset Spark treats it as plain dropDuplicates. */
  def dedupWithinWatermark(ds: Dataset[org.apache.spark.sql.Row],
                           keyCols: Seq[String], tsCol: String,
                           delay: String): Dataset[org.apache.spark.sql.Row] =
    ds.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keyCols)

  /** Batch twin of the streaming dedups, with the DETERMINISTIC
    * representative the streaming side converges to when arrivals are
    * event-time ordered: the row with the smallest `(tsCol, tieCols)`
    * per key. Plain dropDuplicates keeps an ARBITRARY row, which no
    * oracle can re-derive; min_by over the full row struct keeps the
    * earliest and needs one partial-aggregated shuffle, no window
    * straggler. This is the replay/batch-reprocessing semantics of
    * [[dedupWithinWatermark]] on a finite, fully-arrived dataset. */
  def dedupEarliestBatch(df: org.apache.spark.sql.DataFrame,
                         keyCols: Seq[String], tsCol: String,
                         tieCols: Seq[String] = Seq.empty): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(keyCols.nonEmpty, "dedupEarliestBatch: need at least one key column")
    val ord = struct((tsCol +: tieCols).map(col): _*)
    val row = struct(df.columns.map(col): _*)
    val kept = df.groupBy(keyCols.map(col): _*)
      .agg(min_by(row, ord).as("__first"))
      .select(col("__first.*"))
    kept
  }

  /** Running per-key event count, updated every micro-batch —
    * the minimal mapGroupsWithState shape (update-mode state). */
  def runningCounts(events: Dataset[Event]): Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .mapGroupsWithState[Long, (Long, Long)](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[Long]) =>
          val next = state.getOption.getOrElse(0L) + batch.size
          state.update(next)
          (userId, next)
      }
  }

  /** Running per-user (count, sum) via `transformWithState` — the
    * operator-state-v2 surface (Spark 4): typed `ValueState` from the
    * processor handle instead of a single opaque GroupState value, so
    * a processor can hold several independently-evolving states and
    * register timers. Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`); HDFS-backed
    * state rejects this operator at query start. */
  class RunningStatsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, (Long, Long, Double)] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders
    @transient private var stats: ValueState[(Long, Double)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      stats = getHandle.getValueState[(Long, Double)](
        "stats", Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble), TTLConfig.NONE)
    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Long, Double)] = {
      var (n, sum) = Option(stats.get()).getOrElse((0L, 0.0))
      rows.foreach { e => n += 1; sum += e.value }
      stats.update((n, sum))
      Iterator.single((userId, n, sum))
    }
  }

  /** One (userId, running count, running sum) row per key per
    * micro-batch that touched it. */
  def runningStatsTws(events: Dataset[Event]): Dataset[(Long, Long, Double)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_.userId)
      .transformWithState(new RunningStatsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Per-user running top-k values via `ListState` — the multi-state
    * side of the v2 surface: the state is a bounded LIST the
    * processor rewrites per batch (a GroupState would serialize one
    * opaque blob; ListState lets the store page elements). State is
    * capped at k elements per key by construction — eviction is the
    * processor's own top-k trim, so memory is bounded at any stream
    * length. */
  class TopKProcessor(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, (Long, Seq[Double])] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ListState}
    import org.apache.spark.sql.Encoders
    @transient private var top: ListState[Double] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      top = getHandle.getListState[Double]("top", Encoders.scalaDouble, TTLConfig.NONE)
    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Seq[Double])] = {
      val merged = (top.get().toSeq ++ rows.map(_.value))
        .sorted(Ordering[Double].reverse).take(k)
      top.put(merged.toArray)
      Iterator.single((userId, merged))
    }
  }

  /** One (userId, descending top-k values) row per key per touching
    * micro-batch. */
  def runningTopKTws(events: Dataset[Event], k: Int): Dataset[(Long, Seq[Double])] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    require(k >= 1, s"runningTopKTws: k must be >= 1: $k")
    events.groupByKey(_.userId)
      .transformWithState(new TopKProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  /** Event-time TIMER session closer — the state-v2 surface's third
    * leg (SURVEY §2.10): ValueState + `registerTimer`, firing when the
    * WATERMARK passes the session's quiet-gap deadline rather than on
    * processing-time wall clock ([[sessionSummaries]]' flavor). Replay
    * determinism follows: the same event stream with the same
    * watermark policy closes the same sessions at the same event-time
    * boundaries, however fast the replay runs. Per key: one state
    * tuple, one live timer (re-armed on every arrival — stale
    * deadlines are deleted first), both freed on fire; memory is O(1)
    * per active key. An arrival whose event time is already past the
    * open session's quiet gap closes that session inline (the
    * watermark — hence the timer — trails the very batch carrying the
    * arrival), so sessions split at the same event-time boundaries as
    * `session_window`: strict gap, events exactly gap-apart merge
    * (the q172 boundary rule). */
  class SessionTimerProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, SessionOut] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders
    @transient private var st: ValueState[(Long, Double, Long)] = _ // n, sum, maxTs
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Double, Long)](
        "session",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaLong),
        TTLConfig.NONE)
    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[SessionOut] = {
      // An arrival already past the open session's quiet gap closes
      // that session INLINE — the timer cannot have fired yet (the
      // watermark only advances after the batch that carries this very
      // event), and waiting for it would wrongly merge the two
      // sessions. The timer's job is only the no-further-events tail.
      // Strict `>` on the gap: events exactly gap-apart MERGE, the
      // session_window boundary rule.
      val out = Seq.newBuilder[SessionOut]
      var cur = Option(st.get())
      rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
        cur = cur match {
          case Some((n, sum, maxTs)) if e.ts.getTime > maxTs + gapMs =>
            out += SessionOut(userId, n, sum)
            Some((1L, e.value, e.ts.getTime))
          case Some((n, sum, maxTs)) =>
            Some((n + 1, sum + e.value, math.max(maxTs, e.ts.getTime)))
          case None =>
            Some((1L, e.value, e.ts.getTime))
        }
      }
      val (n, sum, maxTs) = cur.get
      // exactly one live deadline per key: drop any stale timer, arm
      // the new quiet-gap deadline off the latest event time seen
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(maxTs + gapMs)
      st.update((n, sum, maxTs))
      out.result().iterator
    }
    override def handleExpiredTimer(userId: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessionOut] = {
      val closed = Option(st.get()).map(s => SessionOut(userId, s._1, s._2))
      st.clear()
      closed.iterator
    }
  }

  /** Sessions closed by event-time timers: one (userId, n, sum) row
    * per session, emitted when the watermark passes the last event in
    * the session plus `gapMs`. `delay` is the out-of-orderness bound
    * handed to the watermark. */
  def sessionCloseTws(events: Dataset[Event], gapMs: Long,
                      delay: String = "10 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    require(gapMs > 0, s"sessionCloseTws: gapMs must be positive: $gapMs")
    events.withWatermark("ts", delay)
      .groupByKey(_.userId)
      .transformWithState(new SessionTimerProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  case class TypedEvent(ts: Timestamp, userId: Long, eventType: String)

  /** Streaming funnel — `ops.Funnels.funnel`'s real-time twin: per
    * user, advance through `stages` on each strictly-later matching
    * event and emit (userId, stage, ts) whenever the stage ADVANCES.
    * State is one (stage, lastTs) pair per user — O(1), unbounded
    * streams safe. Within a micro-batch rows are walked in event-time
    * order; ACROSS batches ordering is the stream's delivery order —
    * an event arriving after a later stage already matched cannot
    * retroactively improve the path (the batch op replays history;
    * the stream decides online — the standard trade). */
  class FunnelProcessor(stages: Seq[String])
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, TypedEvent, (Long, Int, Timestamp)] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders
    @transient private var st: ValueState[(Int, Long)] = _ // (stage, lastTs micros)
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Int, Long)](
        "funnel", Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong), TTLConfig.NONE)
    override def handleInputRows(userId: Long, rows: Iterator[TypedEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Int, Timestamp)] = {
      var (stage, lastTs) = Option(st.get()).getOrElse((0, Long.MinValue))
      val out = Seq.newBuilder[(Long, Int, Timestamp)]
      rows.toSeq.sortBy(e => (e.ts.getTime, e.eventType)).foreach { e =>
        if (stage < stages.size && e.eventType == stages(stage) &&
            (stage == 0 || e.ts.getTime > lastTs)) {
          stage += 1; lastTs = e.ts.getTime
          out += ((userId, stage, e.ts))
        }
      }
      st.update((stage, lastTs))
      out.result().iterator
    }
  }

  /** Emit (userId, reached stage 1..n, at-ts) on every advance. */
  def funnelTws(events: Dataset[TypedEvent], stages: Seq[String]): Dataset[(Long, Int, Timestamp)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      s"funnelTws: stages must be non-empty and distinct: $stages")
    events.groupByKey(_.userId)
      .transformWithState(new FunnelProcessor(stages),
        TimeMode.None(), OutputMode.Append())
  }
}
