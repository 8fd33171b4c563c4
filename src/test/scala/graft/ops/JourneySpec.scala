package graft.ops

import graft.WithSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** [[Journey]] funnel/cohort semantics and
  * [[Cooccurrence.associationRules]] exact-integer scoring. */
class JourneySpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private def t(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("funnel: stages must occur strictly in order per user") {
    // u1 converts fully; u2 clicked BEFORE viewing (click must not
    // count) and purchased after the view (no qualifying click -> no
    // purchase stage); u3 views only
    val ev = Seq(
      (1L, t(1), "view"), (1L, t(2), "click"), (1L, t(3), "purchase"),
      (2L, t(1), "click"), (2L, t(2), "view"), (2L, t(3), "purchase"),
      (3L, t(1), "view"))
      .toDF("user_id", "ts", "event_type")
    val got = Journey.funnel(ev, "user_id", col("ts"),
        col("event_type"), Seq("view", "click", "purchase"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("stage1_view" -> 3L, "stage2_click" -> 1L,
      "stage3_purchase" -> 1L))
  }

  test("funnel: equal timestamps do not advance a stage (strict >)") {
    val ev = Seq((1L, t(1), "view"), (1L, t(1), "click"))
      .toDF("user_id", "ts", "event_type")
    val got = Journey.funnel(ev, "user_id", col("ts"),
        col("event_type"), Seq("view", "click"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("stage1_view" -> 1L, "stage2_click" -> 0L))
  }

  test("lastTouchAttribution: most recent strictly-preceding touch, " +
      "NULL when none") {
    val ev = Seq(
      (1L, t(1), 10L, "view"), (1L, t(2), 11L, "click"),
      (1L, t(3), 12L, "purchase"), (1L, t(4), 13L, "purchase"),
      (2L, t(5), 20L, "purchase"), // no prior touch
      (3L, t(6), 30L, "purchase"), (3L, t(7), 31L, "view")) // touch after
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Journey.lastTouchAttribution(ev, "user_id", col("ts"),
        col("event_id"), col("event_type"), Seq("view", "click"),
        "purchase")
      .select("event_id", "touch_type").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(got == Map(12L -> Some("click"), 13L -> Some("click"),
      20L -> None, 30L -> None))
  }

  test("transitions: adjacent pairs per user, ppm rows sum per state") {
    val ev = Seq(
      (1L, t(1), 10L, "view"), (1L, t(2), 11L, "click"),
      (1L, t(3), 12L, "view"),
      (2L, t(1), 20L, "view"), (2L, t(2), 21L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Journey.transitions(ev, "user_id", col("ts"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      ("view", "click") -> (1L, 2L, 500000L),
      ("view", "view") -> (1L, 2L, 500000L),
      ("click", "view") -> (1L, 1L, 1000000L)))
  }

  test("sessionPaths: gap splits sessions, paths are time-ordered") {
    val ev = Seq(
      (1L, t(1, 0), 10L, "view"), (1L, t(1, 0), 11L, "click"),
      (1L, t(2, 0), 12L, "view"), // next day -> new session
      (2L, t(1, 0), 20L, "view"), (2L, t(1, 0), 21L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Journey.sessionPaths(ev, "user_id", "ts", "event_id",
        col("event_type"), gapSeconds = 1800L)
      .as[(String, Long)].collect().toMap
    assert(got == Map("view>click" -> 2L, "view" -> 1L))
  }

  test("associationRules: presence counts once, exact ppm, both " +
      "directions") {
    // baskets: {a,b} x3, {a} x1 -> N=4, n_a=4, n_b=3, n_ab=3
    // a->b conf = 3/4 = 750000 ppm; lift = 3*4/(4*3) = 1 -> 1000000
    // b->a conf = 3/3 = 1000000; lift identical
    val rows = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"), // duplicate a counts once
      (2L, "a"), (2L, "b"), (3L, "a"), (3L, "b"), (4L, "a"))
      .toDF("bk", "it")
    val got = Cooccurrence
      .associationRules(rows, "bk", "it", minSupport = 2L)
      .collect().toSet
    assert(got == Set(
      Row("a", "b", 3L, 4L, 3L, 750000L, 1000000L),
      Row("b", "a", 3L, 3L, 4L, 1000000L, 1000000L)))
  }

  test("associationRules: minSupport prunes pairs") {
    val rows = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "c"),
      (3L, "a"), (3L, "c")).toDF("bk", "it")
    val got = Cooccurrence
      .associationRules(rows, "bk", "it", minSupport = 2L)
      .select("a", "b").as[(String, String)].collect().toSet
    assert(got == Set(("a", "c"), ("c", "a")))
  }
}
