package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** User-journey analytics: ordered conversion funnels and cohort
  * retention — the product-analytics half of the OLAP surface. Both
  * are exact (timestamp comparisons and integer week arithmetic, no
  * float), so any relational engine replays them bit-for-bit.
  */
object Journey {

  /** Ordered conversion funnel: a user reaches stage k when an event
    * of `stages(k)`'s type exists STRICTLY AFTER the timestamp at
    * which they reached stage k-1 (first-touch semantics: the stage
    * timestamp is the earliest qualifying event). Output one row per
    * stage: (stage, n_users) with `stage` prefixed by its 1-based
    * index so lexicographic order is funnel order.
    *
    * Plan: one filtered min-aggregation per stage, each joined to the
    * previous stage's user table (user-dim-sized → broadcast under
    * AQE); counts are single-row aggregates unioned at the end. No
    * window over the raw event stream, no per-user event collection —
    * a 100 TB event table is touched once per stage with a pushed
    * event-type filter.
    */
  def funnel(
      events: DataFrame, user: String, ts: Column, eventType: Column,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val stageFrames = stages.zipWithIndex
      .scanLeft(Option.empty[DataFrame]) { case (prev, (st, _)) =>
        val base = events.filter(eventType === st)
          .select(col(user), ts.as("__ts"))
        val qualified = prev match {
          case None => base
          case Some(p) =>
            base.join(p.select(col(user), col("__t").as("__pt")), user)
              .filter(col("__ts") > col("__pt"))
        }
        Some(qualified.groupBy(col(user)).agg(min(col("__ts")).as("__t")))
      }
      .flatten
    stageFrames.zip(stages).zipWithIndex
      .map { case ((f, st), i) =>
        f.agg(count(lit(1)).as("n_users"))
          .select(lit(s"stage${i + 1}_$st").as("stage"), col("n_users"))
      }
      .reduce(_.unionByName(_))
  }

  /** Weekly cohort retention: users cohort by the ISO week
    * (`date_trunc("week")`, Monday) of their FIRST event of any type;
    * `n_users` counts the cohort's distinct users active in cohort
    * week + k, for k in [0, maxWeeks]. Output:
    * (cohort_week `yyyy-MM-dd`, k, n_users).
    *
    * Plan: one first-event aggregation + one distinct (user, week)
    * projection off the same scan shape, joined on the user dim, then
    * a count-distinct keyed by (cohort, k) — everything exact-integer
    * (`datediff div 7`; no float week math).
    */
  def cohortRetention(
      events: DataFrame, user: String, ts: Column,
      maxWeeks: Int): DataFrame = {
    require(maxWeeks >= 0, "maxWeeks must be >= 0")
    val first = events.groupBy(col(user))
      .agg(date_trunc("week", min(ts)).as("__cw"))
    val active = events
      .select(col(user), date_trunc("week", ts).as("__w"))
      .distinct()
    first.join(active, user)
      .select(col(user),
        date_format(col("__cw"), "yyyy-MM-dd").as("cohort_week"),
        expr("datediff(__w, __cw) div 7").cast("long").as("k"))
      .filter(col("k") >= 0 && col("k") <= maxWeeks)
      .groupBy(col("cohort_week"), col("k"))
      .agg(countDistinct(col(user)).as("n_users"))
  }
}
