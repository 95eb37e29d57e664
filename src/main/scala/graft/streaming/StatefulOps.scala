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
}
