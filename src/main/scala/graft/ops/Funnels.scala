package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral-analytics operators over an event stream table — the
  * ordered-sequence queries (funnel conversion, cohort retention)
  * that in the reference era were hand-written secondary-sort reduce
  * jobs (sort by (user, ts), walk the sequence in the reducer; the
  * q12 SecondarySort shape). Declaratively each stage is a
  * conditional MIN per user — "first B strictly after the user's
  * first A" — which Catalyst plans as plain hash aggregations, no
  * per-user sort anywhere.
  */
object Funnels {

  /** Staged funnel: for each user, the timestamp of the first
    * occurrence of `stages(0)`, then of `stages(1)` STRICTLY AFTER
    * that, and so on. Output: userCol, stage (count of stages
    * reached, 0..n), t_0..t_{n-1} (nullable timestamps).
    *
    * One aggregation pass per stage over the (already filtered)
    * stage events, each a hash-partial groupBy on the user key, glued
    * by left joins on userCol — at scale that is `n_stages` shuffles
    * of (user, min-ts) pairs, NOT a per-user event sort; AQE
    * broadcast-joins the later (rapidly shrinking) stage frames. The
    * base is every distinct user, so non-converting users keep their
    * row (stage 0) — dropping them would misstate conversion. */
  def funnel(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "Funnels.funnel: need at least one stage")
    require(stages.distinct.size == stages.size,
      s"Funnels.funnel: repeated stage types not supported: $stages")
    val base = events.select(col(userCol)).distinct()
    // fold: each step narrows to events of this stage type later than
    // the previous stage's per-user min, then mins per user
    val withStages = stages.zipWithIndex.foldLeft(base) { case (acc, (stage, i)) =>
      val tcol = s"t_$i"
      val prev = if (i == 0) None else Some(s"t_${i - 1}")
      val stageEvents = events.where(col(typeCol) === stage)
        .select(col(userCol), col(tsCol).as("__ts"))
      val joined = prev match {
        case None => stageEvents
        case Some(p) =>
          stageEvents.join(acc.where(col(p).isNotNull).select(col(userCol), col(p)),
              Seq(userCol))
            .where(col("__ts") > col(p))
            .select(col(userCol), col("__ts"))
      }
      val mins = joined.groupBy(col(userCol)).agg(min(col("__ts")).as(tcol))
      acc.join(mins, Seq(userCol), "left")
    }
    // fold ascending so the HIGHEST reached stage's check ends up
    // outermost: when(t_n-1 set, n).otherwise(... when(t_0 set, 1) ...)
    val stageCount = stages.indices.foldLeft(lit(0)) { case (acc, i) =>
      when(col(s"t_$i").isNotNull, lit(i + 1)).otherwise(acc)
    }
    withStages.withColumn("stage", stageCount.cast("long"))
      .select(col(userCol) +: col("stage") +: stages.indices.map(i => col(s"t_$i")): _*)
  }

  /** Rolling N-day active users (DAU/WAU/MAU family): for every day
    * with activity, the distinct users active in the trailing
    * `windowDays` window. NOT a range join — a (user, day) row would
    * be compared against every spine day (O(rows·days) at 100 TB).
    * Instead each distinct (user, day) fans out to the `windowDays`
    * target days it contributes to (`explode(sequence)`, map-only,
    * bounded w× growth) and the count-distinct aggregates per target
    * day; a semi join against the real-day spine drops the trailing
    * ghost days the fan-out invents past the last active date. */
  def rollingActive(events: DataFrame, userCol: String, tsCol: String,
                    windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"Funnels.rollingActive: windowDays must be >= 1: $windowDays")
    // a null timestamp would flow into BOTH legs — a day=null output
    // row pooling all null-ts users, and date_add(null) silently
    // dropping them from real windows — so fail loudly in-plan
    // instead (the hashSplit/weightedSample convention)
    val days = events.select(col(userCol),
        when(col(tsCol).isNull, raise_error(lit(
          s"Funnels.rollingActive: null $tsCol — filter or impute timestamps first")))
          .otherwise(to_date(col(tsCol))).as("__day"))
      .distinct()
    val spine = days.select(col("__day").as("day")).distinct()
    days
      .select(col(userCol),
        explode(sequence(lit(0), lit(windowDays - 1))).as("__i"), col("__day"))
      .select(col(userCol), date_add(col("__day"), col("__i")).as("day"))
      .join(spine, Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(countDistinct(col(userCol)).as("active_users"))
  }

  /** Cohort retention: cohort = the user's first active day; one row
    * per (cohort day, day offset) with the count of distinct cohort
    * users active that day. The classic triangle matrix, computed as
    * one groupBy-min (cohorts), one join back, one distinct count —
    * day arithmetic in whole days (datediff), no timestamp floats. */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val cohorts = events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("cohort"))
    events.select(col(userCol), to_date(col(tsCol)).as("__day"))
      .distinct() // a user counts once per active day
      .join(cohorts, Seq(userCol))
      .groupBy(col("cohort"), datediff(col("__day"), col("cohort")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("cohort"), col("day_offset").cast("long"), col("n_users"))
  }
}
