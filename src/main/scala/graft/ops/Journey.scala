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

  /** First-order event-type transition matrix (the Markov-chain
    * statistics of the user journey): for every observed (from → to)
    * adjacent pair in each user's (ts, id) order, the pair count, the
    * from-state total, and the transition probability as an exact
    * parts-per-million integer. One lead window + two counting
    * aggregations + a state-dim join. Output:
    * (from_type, to_type, n, n_from, p_ppm).
    */
  def transitions(
      events: DataFrame, user: String, ts: Column, id: Column,
      eventType: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(user)).orderBy(ts, id)
    val pairs = events
      .select(eventType.as("from_type"),
        lead(eventType, 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromTotals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
    pairs.join(fromTotals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        expr("n * 1000000L div n_from").as("p_ppm"))
  }

  /** Session path mining: split each user's events into gap-bounded
    * sessions (the [[TimeSeries.sessionize]] boundary device — a
    * session extends while gaps are ≤ `gapSeconds`), render each
    * session's ordered event-type sequence as a `>`-joined path
    * string, and count sessions per path. ONE key-partitioned
    * exchange feeds both windows AND the per-session aggregation —
    * hash(user) satisfies the (user, sid) clustering, so Catalyst
    * reuses it (plan-pinned) — and only the final per-PATH count
    * shuffles again, at distinct-path (dim) size. Paths are bounded
    * by session length, not corpus size. Output: (path, n_sessions).
    */
  def sessionPaths(
      events: DataFrame, user: String, tsCol: String, idCol: String,
      eventType: Column, gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, "gap must be positive")
    val order = org.apache.spark.sql.expressions.Window
      .partitionBy(col(user)).orderBy(col(tsCol), col(idCol))
    val run = order.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val us = unix_micros(col(tsCol))
    val boundary = when(
      lag(us, 1).over(order).isNull ||
        us - lag(us, 1).over(order) > gapSeconds * 1000000L,
      lit(1L)).otherwise(lit(0L))
    events
      .withColumn("__sid", sum(boundary).over(run))
      .groupBy(col(user), col("__sid"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(
          col(tsCol).as("t"), col(idCol).as("i"),
          eventType.as("e")))),
        x => x.getField("e")), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
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
