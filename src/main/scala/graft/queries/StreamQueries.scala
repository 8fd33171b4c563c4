package graft.queries

import graft.core.{QueryDef, Tables}
import graft.streaming.EventStream

/** Batch face of the streaming transforms: the same `hourlyStats` plan
  * that runs behind readStream is oracle-checked here over the events
  * table (event-time window → DuckDB date_trunc).
  */
object StreamQueries {
  import QueryDef.sql

  val defs: Seq[QueryDef] = Seq(
    sql(
      "q_event_windows",
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
        |  event_type, count(*) AS n_events,
        |  round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      EventStream.hourlyStats(Tables.events(s, d))
    })
}
