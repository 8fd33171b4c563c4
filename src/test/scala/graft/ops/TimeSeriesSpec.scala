package graft.ops

import java.sql.Timestamp

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // key "a": observations at hours 0, 1, 4 (gap 2-3); key "b": one lone
  // observation (degenerate spine of length 1)
  private lazy val events = Seq(
    ("a", ts("2024-01-01 00:10:00"), 1.0),
    ("a", ts("2024-01-01 00:50:00"), 2.0),
    ("a", ts("2024-01-01 01:20:00"), 4.0),
    ("a", ts("2024-01-01 04:05:00"), 8.0),
    ("b", ts("2024-01-02 12:30:00"), 5.0)
  ).toDF("k", "t", "v")

  private lazy val filled = TimeSeries.gapFill(
    events, key = "k", ts = "t",
    valueAgg = sum(col("v").cast("decimal(18,2)")),
    truncUnit = "hour")

  test("spine is dense from first to last bucket per key") {
    val a = filled.filter(col("k") === "a")
      .select("bucket").as[Timestamp].collect().sorted
    assert(a.toSeq == (0 to 4).map(h => ts(f"2024-01-01 $h%02d:00:00")))
    assert(filled.filter(col("k") === "b").count() == 1)
  }

  test("gap rows carry the last observation forward, observed=false") {
    val rows = filled.filter(col("k") === "a")
      .select(col("bucket"), col("value").cast("string"),
        col("filled").cast("string"), col("observed"))
      .as[(Timestamp, String, String, Boolean)].collect()
      .sortBy(_._1.getTime).toSeq
    assert(rows.map(r => (r._2, r._3, r._4)) == Seq(
      ("3.00", "3.00", true),   // hour 0: 1+2 aggregated
      ("4.00", "4.00", true),
      (null, "4.00", false),    // gap: forward-filled
      (null, "4.00", false),
      ("8.00", "8.00", true)))
  }

  test("gapFill equals a per-key sorted-scan reference on random events") {
    val rnd = new scala.util.Random(11)
    val hourMs = 3600L * 1000
    val base = ts("2024-03-01 00:00:00").getTime
    val rows = (1 to 300).map { _ =>
      val k = s"k${rnd.nextInt(5)}"
      val t = new Timestamp(base + (rnd.nextDouble() * 72 * hourMs).toLong)
      (k, t, (rnd.nextInt(2000) + 1) / 100.0)
    }
    val df = rows.toDF("k", "t", "v")
    val got = TimeSeries.gapFill(df, "k", "t",
        sum(col("v").cast("decimal(18,2)")), "hour")
      .select(col("k"), col("bucket"), col("value").cast("string"),
        col("filled").cast("string"))
      .as[(String, Timestamp, String, String)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // reference: per-key hourly buckets via a plain sorted scan
    val expect = rows.groupBy(_._1).flatMap { case (k, rs) =>
      val byBucket = rs.groupBy(r => r._2.getTime / hourMs * hourMs)
        .view.mapValues(_.map(r => BigDecimal(r._3).setScale(2)).sum).toMap
      val (lo, hi) = (byBucket.keys.min, byBucket.keys.max)
      var lastSeen: Option[BigDecimal] = None
      (lo to hi by hourMs).map { b =>
        val v = byBucket.get(b)
        if (v.isDefined) lastSeen = v
        (k, new Timestamp(b)) ->
          (v.map(_.toString).orNull, lastSeen.map(_.toString).orNull)
      }
    }
    assert(got.size == expect.size)
    expect.foreach { case (key, exp) =>
      assert(got(key) == exp, s"mismatch at $key")
    }
  }

  test("leading edge is not back-filled") {
    // a key whose FIRST bucket exists by construction (spine starts at
    // the first observation) can never have a null fill; assert the
    // invariant: filled is null-free because every spine starts at an
    // observed bucket
    assert(filled.filter(col("filled").isNull).count() == 0)
  }

  test("sessionize splits on gap > threshold, 1-based per key, " +
      "boundaries exact at the threshold") {
    val ev = Seq(
      // user 1: 3 events within 10 min, then a 61-min gap, then 1 more
      (1L, ts("2024-01-01 00:00:00"), 100L),
      (1L, ts("2024-01-01 00:05:00"), 101L),
      (1L, ts("2024-01-01 00:10:00"), 102L),
      (1L, ts("2024-01-01 01:11:00"), 103L),
      // user 2: gap EXACTLY the threshold — same session (> not >=)
      (2L, ts("2024-01-01 00:00:00"), 200L),
      (2L, ts("2024-01-01 01:00:00"), 201L),
      // user 3: tied timestamps — one session, tie order irrelevant
      (3L, ts("2024-01-01 09:00:00"), 301L),
      (3L, ts("2024-01-01 09:00:00"), 300L)
    ).toDF("u", "t", "eid")
    val got = TimeSeries.sessionize(ev, "u", "t", "eid", gapSeconds = 3600L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getTimestamp(2), r.getTimestamp(3), r.getLong(4)))).toMap
    assert(got.size == 4)
    assert(got((1L, 1L)) ==
      ((ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00"), 3L)))
    assert(got((1L, 2L)) ==
      ((ts("2024-01-01 01:11:00"), ts("2024-01-01 01:11:00"), 1L)))
    assert(got((2L, 1L)) ==
      ((ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00"), 2L)))
    assert(got((3L, 1L)) ==
      ((ts("2024-01-01 09:00:00"), ts("2024-01-01 09:00:00"), 2L)))
    // partition-independence
    val re = TimeSeries.sessionize(
      ev.repartition(5), "u", "t", "eid", gapSeconds = 3600L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
      .sortBy(x => (x._1, x._2))
    assert(re.toSeq == got.keys.toSeq.sorted.map(k =>
      (k._1, k._2, got(k)._3)))
  }

  test("trendSlopes: exact slope on planted linear data; " +
      "constant-x groups dropped") {
    import spark.implicits._
    // y = 3x + 7 exactly -> num/den = 3; one group with constant x
    val rows = (0L until 50L).map(x => ("lin", x, 3 * x + 7)) ++
      (0L until 10L).map(i => ("flat", 5L, i))
    val df = rows.toDF("g", "x", "y")
    val got = TimeSeries.trendSlopes(df, "g", col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getString(2), r.getString(3), r.getDouble(4)))
      .toMap
    assert(got.keySet == Set("lin"), "flat group must drop, not emit inf")
    val (n, num, den, slope) = got("lin")
    assert(n == 50L)
    assert(BigInt(num) == BigInt(den) * 3, s"num $num != 3*den $den")
    assert(slope == 3.0)
  }

  test("gapFillLinear: interior gaps take the straight line exactly, " +
      "edges never extrapolate, observed buckets keep their value") {
    import org.apache.spark.sql.functions._
    // key a: observations at hours 0 (v=10) and 3 (v=40) — hours 1,2
    // must interpolate to exactly 20, 30; a second observation run
    // 5 (v=40) → 4 interpolates on the 3..5 segment (40..40 → 40)
    val ts0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def at(h: Int) = new java.sql.Timestamp(ts0.getTime + h * 3600000L)
    val ev = Seq((1L, "a", at(0), 10L), (2L, "a", at(3), 40L),
      (3L, "a", at(5), 40L)).toDF("id", "k", "ts", "v")
    val got = TimeSeries.gapFillLinear(
        ev, "k", "ts", sum(col("v")), "hour")
      .select(col("bucket"), col("interp"), col("observed"))
      .as[(java.sql.Timestamp, Option[Double], Boolean)].collect()
      .sortBy(_._1.getTime).toSeq
    assert(got.map(_._2) == Seq(Some(10.0), Some(20.0), Some(30.0),
      Some(40.0), Some(40.0), Some(40.0)))
    assert(got.map(_._3) == Seq(true, false, false, true, false, true))
    // a key with ONE observation: its single bucket is observed; there
    // is nothing to interpolate and nothing is invented
    val single = Seq((1L, "b", at(2), 7L)).toDF("id", "k", "ts", "v")
    val s = TimeSeries.gapFillLinear(single, "k", "ts", sum(col("v")), "hour")
      .select("interp", "observed")
      .as[(Option[Double], Boolean)].collect().toSeq
    assert(s == Seq((Some(7.0), true)))
  }

  test("cusum: the closed form equals the Page recursion on random " +
      "runs, hand values check, alarms fire on persistent shifts only") {
    import org.apache.spark.sql.functions._
    // hand case: x = 5,5,20,20,5 with k=10 → S = 0,0,10,20,15
    val hand = Seq((1L, 5L), (2L, 5L), (3L, 20L), (4L, 20L), (5L, 5L))
      .map { case (i, x) => ("a", i, x) }.toDF("k", "i", "x")
    val got = TimeSeries.cusum(hand, "k", Seq(col("i")), col("x"),
        drift = 10L, threshold = 15L)
      .select("i", "s_u", "alarm")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 0L, false), (2L, 0L, false), (3L, 10L, false),
      (4L, 20L, true), (5L, 15L, false)))
    // closed form == recursion, random sequences, multiple keys
    val rnd = new scala.util.Random(53)
    val rows = for { k <- Seq("p", "q"); i <- 1L to 200L }
      yield (k, i, rnd.between(-30L, 40L))
    val byKey = rows.groupBy(_._1).map { case (k, rs) =>
      k -> rs.sortBy(_._2).map(_._3).scanLeft(0L) {
        (s, x) => math.max(0L, s + x - 5L) }.tail
    }
    val df = rows.toDF("k", "i", "x")
    val closed = TimeSeries.cusum(df.repartition(13), "k", Seq(col("i")),
        col("x"), drift = 5L, threshold = 100L)
      .select("k", "i", "s_u")
      .as[(String, Long, Long)].collect()
    closed.foreach { case (k, i, s) =>
      assert(s == byKey(k)(i.toInt - 1),
        s"closed form diverged from recursion at ($k, $i)")
    }
  }
}
