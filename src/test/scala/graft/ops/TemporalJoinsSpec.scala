package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalJoinsSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin: latest at-or-before match, ties included, no-prior null") {
    val left = Seq(
      (1L, 100L, ts("2026-01-01 10:00:00")),
      (2L, 100L, ts("2026-01-01 12:00:00")),
      (3L, 200L, ts("2026-01-01 09:00:00"))) // user 200 has no clicks
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, ts("2026-01-01 09:00:00"), 1.0),
      (100L, ts("2026-01-01 10:00:00"), 2.0), // same instant as event 1
      (100L, ts("2026-01-01 11:00:00"), 3.0))
      .toDF("user_id", "ts", "click_value")
    val got = TemporalJoins.asofJoin(
        left, right, "user_id", "ts", Seq("click_value"))
      .select(col("event_id"), col("click_value"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L).contains(2.0)) // tie at 10:00 counts as "at or before"
    assert(got(2L).contains(3.0)) // latest prior, not first
    assert(got(3L).isEmpty)       // no prior observation → null
  }

  test("asofJoin plans one shuffle, no nested-loop join") {
    val left = Seq((1L, 100L, ts("2026-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((100L, ts("2026-01-01 09:00:00"), 1.0))
      .toDF("user_id", "ts", "click_value")
    val plan = TemporalJoins.asofJoin(
        left, right, "user_id", "ts", Seq("click_value"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("bandJoin: inclusive lo, exclusive hi, bands spanning bins") {
    val facts = Seq((1L, 0.0), (2L, 14.999), (3L, 15.0), (4L, 34.999),
      (5L, 35.0), (6L, 59.999), (7L, 60.0), (8L, -1.0))
      .toDF("id", "v")
    val bands = Seq(("low", 0.0, 15.0), ("mid", 15.0, 35.0),
      ("high", 35.0, 60.0)).toDF("band", "lo", "hi")
    // binWidth much smaller than band spans: every band fans across bins
    val got = TemporalJoins.bandJoin(facts, "v", bands, "lo", "hi", 4.0)
      .select("id", "band").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "low", 2L -> "low", 3L -> "mid", 4L -> "mid",
      5L -> "high", 6L -> "high")) // 60.0 and -1.0 fall outside all bands
  }

  test("bandJoin build side adapts: broadcast small, shuffle when forced/large") {
    val facts = Seq((1L, 5.0), (2L, 20.0)).toDF("id", "v")
    val bands = Seq(("low", 0.0, 15.0), ("mid", 15.0, 35.0))
      .toDF("band", "lo", "hi")

    def planOf(bb: Option[Boolean]): String =
      TemporalJoins.bandJoin(facts, "v", bands, "lo", "hi", 4.0, bb)
        .queryExecution.executedPlan.toString

    // small band side: auto picks broadcast
    assert(planOf(None).contains("BroadcastHashJoin"))
    // forced shuffle join: no broadcast exchange, still correct
    val forced = TemporalJoins.bandJoin(
      facts, "v", bands, "lo", "hi", 4.0, Some(false))
    assert(!planOf(Some(false)).contains("BroadcastExchange"))
    assert(forced.select("id", "band").as[(Long, String)].collect().toMap
      == Map(1L -> "low", 2L -> "mid"))
    // auto respects a disabled broadcast threshold (the large-band path)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      assert(!planOf(None).contains("BroadcastExchange"),
        "band side must degrade to a shuffled equi-join")
    } finally spark.conf.set(key, prev)
  }

  test("bandJoin auto gate accounts for the bin fan-out, not just raw size") {
    // facts sized above the broadcast threshold so the only broadcast
    // candidate is the band side
    val facts = spark.range(0, 4000000)
      .select(col("id"), (col("id") % 100).cast("double").as("v"))
    // ONE band row, KBs pre-explode — but 40M bins at this binWidth:
    // the auto path must refuse to broadcast the exploded frame
    val wide = Seq(("all", 0.0, 4e7)).toDF("band", "lo", "hi")
    val plan = TemporalJoins.bandJoin(facts, "v", wide, "lo", "hi", 1.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"),
      s"wide band exploded into millions of bins must not broadcast:\n$plan")
    // sanity: a NARROW band table over the same facts does broadcast
    val narrow = Seq(("lo", 0.0, 50.0), ("hi", 50.0, 100.0))
      .toDF("band", "lo", "hi")
    val p2 = TemporalJoins.bandJoin(facts, "v", narrow, "lo", "hi", 25.0)
      .queryExecution.executedPlan.toString
    assert(p2.contains("BroadcastExchange"), s"narrow bands should broadcast:\n$p2")
  }
}
