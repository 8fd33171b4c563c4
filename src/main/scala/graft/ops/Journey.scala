package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** User-journey analytics: the generic stage-parameterized funnel
  * (the per-user timestamp detail and weekly cohort retention live as
  * inline faces in AnalyticsQueries — this op is the reusable
  * ANY-stage-list summary form). Exact timestamp comparisons, no
  * float, so any relational engine replays it bit-for-bit.
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

  /** Last-touch attribution: for every conversion event, the most
    * recent PRECEDING touch event (strictly earlier in the user's
    * (ts, id) order) and its timestamp — NULL when the conversion had
    * no prior touch. One key-partitioned window pass with an
    * ignore-nulls last over the preceding frame; no self-join, no
    * per-user collection. Output: the conversion rows with
    * (touch_type, touch_ts) appended.
    */
  def lastTouchAttribution(
      events: DataFrame, user: String, ts: Column, id: Column,
      eventType: Column, touchTypes: Seq[String],
      conversionType: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(user)).orderBy(ts, id)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val isTouch = eventType.isin(touchTypes: _*)
    events
      .withColumn("touch_type",
        last(when(isTouch, eventType), ignoreNulls = true).over(w))
      .withColumn("touch_ts",
        last(when(isTouch, ts), ignoreNulls = true).over(w))
      .filter(eventType === conversionType)
  }
}
