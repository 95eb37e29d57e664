package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming surface over event streams. The reference is
  * strictly batch ("Hadoop Streaming" is an external-process UDF, not
  * stream processing — SURVEY.md §2.10), so this module is gap-filling
  * extension surface: tumbling/sliding/session windows with watermarks,
  * and stateful dedup.
  *
  * Every builder takes any events-shaped DataFrame — batch or
  * streaming — so the exact same plan is unit-testable in batch mode
  * and oracle-checked via the batch twins (q16–q18), which is how
  * batch/stream parity is pinned.
  *
  * Scale posture: watermarks bound state; aggregations are keyed by
  * (window, key) and shuffle once; late data beyond the watermark is
  * dropped (semantics pinned in WindowsSpec).
  */
object Windows {

  /** Tumbling count/sum per key (q16's shape). */
  def tumbling(events: DataFrame, keyCol: String, size: String,
               watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src.groupBy(col(keyCol), window(col("ts"), size))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sv"))
      .select(col(keyCol), col("window.start").as("window_start"), col("n"), col("sv"))
  }

  /** Sliding window aggregate (q17's capability in stream form). */
  def sliding(events: DataFrame, keyCol: String, size: String, slide: String,
              watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src.groupBy(col(keyCol), window(col("ts"), size, slide))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sv"))
      .select(col(keyCol), col("window.start").as("window_start"), col("n"), col("sv"))
  }

  /** Gap-based session windows (q18's capability in stream form):
    * `session_window` closes a session after `gap` inactivity. */
  def sessions(events: DataFrame, keyCol: String, gap: String,
               watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src.groupBy(col(keyCol), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n"), min("ts").as("start_ts"), max("ts").as("end_ts"))
      .select(col(keyCol), col("n"), col("start_ts"), col("end_ts"))
  }

  /** Stateful streaming dedup on `keys` within the watermark horizon —
    * the streaming form of exact dedup (state is bounded by the
    * watermark, so it runs indefinitely at scale). */
  def dedupWithinWatermark(events: DataFrame, watermark: String, keys: String*): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.toSeq)

  /** Stream-stream attribution join: pair each `effects` event with
    * the `causes` event of the same `key` that happened at most
    * `within` BEFORE it (click→impression, purchase→signup).
    *
    * Both sides carry a watermark and the join condition carries the
    * time bound — the two things Spark needs to bound join STATE: a
    * buffered cause is dropped once the effect-side watermark passes
    * `cause.ts + within`, so state does not grow with the stream.
    * An unbounded stream-stream equi-join (no watermark, no range)
    * buffers both streams forever — never ship that shape. Inner join
    * by default; "leftOuter" (effects side) emits unmatched effects
    * after the watermark closes their window.
    *
    * The result carries BOTH sides' columns under the `cause`/`effect`
    * aliases — select with qualified names (`cause.ts`, `effect.ts`). */
  def attributionJoin(causes: DataFrame, effects: DataFrame, key: String,
                      watermark: String, within: String,
                      joinType: String = "inner"): DataFrame = {
    val c = causes.withWatermark("ts", watermark).alias("cause")
    val e = effects.withWatermark("ts", watermark).alias("effect")
    // expr() — the interval bound isn't expressible with Column ops
    e.join(c,
      expr(s"cause.$key = effect.$key AND " +
        s"effect.ts >= cause.ts AND effect.ts <= cause.ts + INTERVAL $within"),
      joinType)
  }
}
