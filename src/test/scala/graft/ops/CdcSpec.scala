package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CdcSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  test("diffSnapshots classifies insert/delete/update and skips unchanged") {
    val oldSnap = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("d"))
    ).toDF("k", "v")
    val newSnap = Seq(
      (2L, Some("B")), (3L, None), (4L, Some("d")), (5L, Some("e"))
    ).toDF("k", "v")
    val got = Cdc.diffSnapshots(oldSnap, newSnap, Seq("k"), Seq("v"))
      .select("k", "op", "old_v", "new_v")
      .as[(Long, String, Option[String], Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "delete", Some("a"), None),
      (2L, "update", Some("b"), Some("B")),
      (5L, "insert", None, Some("e"))))
    // k=3 (null attr both sides) and k=4 (equal) produce no row
  }

  test("diffSnapshots null transitions count as changes, null=null does not") {
    val oldSnap = Seq((1L, Option("x")), (2L, Option.empty[String])).toDF("k", "v")
    val newSnap = Seq((1L, Option.empty[String]), (2L, Option("y"))).toDF("k", "v")
    val ops = Cdc.diffSnapshots(oldSnap, newSnap, Seq("k"), Seq("v"))
      .select("k", "op").as[(Long, String)].collect().toMap
    assert(ops == Map(1L -> "update", 2L -> "update"))
  }

  test("property: applyDiff(old, diff(old, new)) == new on random snapshots") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      def snap() = (1 to 300).flatMap { i =>
        if (rnd.nextDouble() < 0.7)
          Some((i.toLong,
            if (rnd.nextDouble() < 0.1) None else Some(s"v${rnd.nextInt(4)}"),
            rnd.nextInt(100)))
        else None
      }.toDF("k", "v", "n")
      val oldSnap = snap()
      val newSnap = snap()
      val keys = Seq("k"); val attrs = Seq("v", "n")
      val got = Cdc.applyDiff(oldSnap,
          Cdc.diffSnapshots(oldSnap, newSnap, keys, attrs), keys, attrs)
        .as[(Long, Option[String], Int)].collect().sorted.toSeq
      val want = newSnap
        .as[(Long, Option[String], Int)].collect().sorted.toSeq
      assert(got == want, s"round-trip failed at seed $seed")
    }
  }

  test("null KEYS are first-class: diff classifies them, apply applies " +
      "them, scd1 replaces them") {
    val oldSnap = Seq((Option(1L), "a"), (Option.empty[Long], "x"))
      .toDF("k", "v")
    val newSnap = Seq((Option(1L), "a"), (Option.empty[Long], "y"))
      .toDF("k", "v")
    // null-key value change must be ONE update, not a spurious insert
    val d = Cdc.diffSnapshots(oldSnap, newSnap, Seq("k"), Seq("v"))
    assert(d.select("op").as[String].collect().toSeq == Seq("update"))
    // and applying it must converge on the new snapshot
    val applied = Cdc.applyDiff(oldSnap, d, Seq("k"), Seq("v"))
      .as[(Option[Long], String)].collect().toSet
    assert(applied == Set((Option(1L), "a"), (None, "y")))
    // scd1: the null-key batch row replaces, never duplicates
    val merged = Cdc.scd1Merge(oldSnap, newSnap, Seq("k"))
      .as[(Option[Long], String)].collect().toSet
    assert(merged == Set((Option(1L), "a"), (None, "y")))
  }

  test("scd1Merge upserts: batch wins, untouched target survives") {
    val target = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val batch = Seq((2L, "B"), (3L, "c")).toDF("k", "v")
    val got = Cdc.scd1Merge(target, batch, Seq("k"))
      .as[(Long, String)].collect().sorted.toSeq
    assert(got == Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("scd1Merge rejects mismatched schemas") {
    val target = Seq((1L, "a")).toDF("k", "v")
    val batch = Seq((1L, "a")).toDF("k", "w")
    intercept[IllegalArgumentException] {
      Cdc.scd1Merge(target, batch, Seq("k"))
    }
  }

  test("scd2Merge: change closes + reopens, no-op unchanged, new key opens") {
    val history = Seq(
      // k=1: one closed + one current version
      (1L, "v1", Some("2020-01-01"), Some("2021-01-01")),
      (1L, "v2", Some("2021-01-01"), None),
      // k=2: current only, batch restates it (no-op)
      (2L, "w1", Some("2020-06-01"), None),
      // k=3: current only, untouched by batch
      (3L, "z1", Some("2020-09-01"), None)
    ).toDF("k", "v", "valid_from", "valid_to")
      .select($"k", $"v",
        to_timestamp($"valid_from").as("valid_from"),
        to_timestamp($"valid_to").as("valid_to"))
    val batch = Seq(
      (1L, "v3", "2022-01-01"), // change
      (2L, "w1", "2022-01-01"), // no-op
      (9L, "n1", "2022-01-01")  // brand-new key
    ).toDF("k", "v", "effective_at")
      .withColumn("effective_at", to_timestamp($"effective_at"))
    val got = Cdc.scd2Merge(history, batch, Seq("k"), Seq("v"))
      .select($"k", $"v", date_format($"valid_from", "yyyy-MM-dd").as("f"),
        date_format($"valid_to", "yyyy-MM-dd").as("t"))
      .as[(Long, String, String, Option[String])]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(got == Seq(
      (1L, "v1", "2020-01-01", Some("2021-01-01")), // closed passes through
      (1L, "v2", "2021-01-01", Some("2022-01-01")), // closed by the change
      (1L, "v3", "2022-01-01", None),               // reopened
      (2L, "w1", "2020-06-01", None),               // no-op: stays current
      (3L, "z1", "2020-09-01", None),               // untouched
      (9L, "n1", "2022-01-01", None)))              // new key opens
  }

  test("scd2AsOf: point-in-time read returns exactly the version live " +
      "at t, at most one per key") {
    val history = Seq(
      (1L, "v1", Some("2020-01-01"), Some("2021-01-01")),
      (1L, "v2", Some("2021-01-01"), None),
      (2L, "w1", Some("2020-06-01"), None),
      (3L, "z1", Some("2022-03-01"), None) // opens after the mid probe
    ).toDF("k", "v", "valid_from", "valid_to")
      .select($"k", $"v",
        to_timestamp($"valid_from").as("valid_from"),
        to_timestamp($"valid_to").as("valid_to"))
    def at(t: String): Seq[(Long, String)] =
      Cdc.scd2AsOf(history, to_timestamp(lit(t)))
        .select($"k", $"v").as[(Long, String)].collect().sortBy(_._1).toSeq
    // before anything existed
    assert(at("2019-01-01").isEmpty)
    // mid: k=1 still on v1 (2021-01-01 close is exclusive at the
    // boundary the merge uses: valid_to > t), k=2 live, k=3 not yet
    assert(at("2020-07-01") == Seq((1L, "v1"), (2L, "w1")))
    // exactly AT a version boundary the new version is live
    assert(at("2021-01-01") == Seq((1L, "v2"), (2L, "w1")))
    // current state shows every open version
    assert(at("2023-01-01") == Seq((1L, "v2"), (2L, "w1"), (3L, "z1")))
    // composed with scd2Merge, any read is still <= one row per key
    val merged = Cdc.scd2Merge(history,
      Seq((1L, "v9", "2022-06-01")).toDF("k", "v", "effective_at")
        .withColumn("effective_at", to_timestamp($"effective_at")),
      Seq("k"), Seq("v"))
    Seq("2019-01-01", "2020-07-01", "2022-01-01", "2023-01-01").foreach {
      t =>
        val perKey = Cdc.scd2AsOf(merged, to_timestamp(lit(t)))
          .groupBy($"k").count()
          .select(coalesce(max($"count"), lit(0L)))
          .as[Long].first()
        assert(perKey <= 1L, s"multiple live versions at $t")
    }
  }

  test("aggRefresh: any batch split folds to the one-shot aggregate; " +
    "retractions subtract; emptied keys leave the state") {
    import spark.implicits._
    val rows = (1L to 90L).map(i => (s"k${i % 7}", i)).toDF("k", "v")
    val oneShot = Cdc.aggState(rows, Seq("k"), "v")
      .as[(String, Long, Long)].collect().toSet
    // fold in three uneven batches
    val b = (n: Int) => rows.filter(col("v") % 3 === n)
    val folded = Cdc.aggRefresh(
        Cdc.aggRefresh(Cdc.aggState(b(0), Seq("k"), "v"),
          b(1), Seq("k"), "v"),
        b(2), Seq("k"), "v")
      .as[(String, Long, Long)].collect().toSet
    assert(folded == oneShot)
    // retraction: remove one row of k1 via weight -1, then re-assert a
    // corrected value — n is back, total moved by the delta
    val retract = Seq(("k1", 8L, -1L), ("k1", 11L, 1L))
      .toDF("k", "v", "w")
    val corrected = Cdc.aggRefresh(Cdc.aggState(rows, Seq("k"), "v"),
        retract, Seq("k"), "v", weightCol = Some("w"))
      .filter(col("k") === "k1").as[(String, Long, Long)].collect().head
    val before = oneShot.find(_._1 == "k1").get
    assert(corrected == (("k1", before._2, before._3 + 3L)))
    // a key fully retracted leaves the state (no dead zero rows)
    val solo = Seq(("only", 5L)).toDF("k", "v")
    val gone = Cdc.aggRefresh(Cdc.aggState(solo, Seq("k"), "v"),
      Seq(("only", 5L, -1L)).toDF("k", "v", "w"),
      Seq("k"), "v", weightCol = Some("w"))
    assert(gone.count() == 0L)
  }

  test("property: aggApplyDiff(state(v1), diff(v1,v2)) == state(v2) on " +
      "random snapshots (group-moving updates, emptied groups)") {
    import org.apache.spark.sql.functions.col
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      // group 'gX' appears only in v1 for some seeds → must empty out
      def snap() = (1 to 250).flatMap { i =>
        if (rnd.nextDouble() < 0.7)
          Some((i.toLong, s"g${rnd.nextInt(4)}", rnd.nextInt(100).toLong))
        else None
      }.toDF("k", "g", "v")
      val v1 = snap(); val v2 = snap()
      val got = Cdc.aggApplyDiff(
          Cdc.aggState(v1, Seq("g"), "v"),
          Cdc.diffSnapshots(v1, v2, Seq("k"), Seq("g", "v")),
          "g", oldVal = col("old_v"), newVal = col("new_v"))
        .as[(String, Long, Long)].collect().sorted.toSeq
      val want = Cdc.aggState(v2, Seq("g"), "v")
        .as[(String, Long, Long)].collect().sorted.toSeq
      assert(got == want, s"IVM refresh diverged at seed $seed")
    }
    // the emptied-group case, deterministically: one group fully deleted
    val a = Seq((1L, "keep", 3L), (2L, "gone", 9L)).toDF("k", "g", "v")
    val b = Seq((1L, "keep", 3L)).toDF("k", "g", "v")
    val refreshed = Cdc.aggApplyDiff(
        Cdc.aggState(a, Seq("g"), "v"),
        Cdc.diffSnapshots(a, b, Seq("k"), Seq("g", "v")),
        "g", oldVal = col("old_v"), newVal = col("new_v"))
      .as[(String, Long, Long)].collect().toSeq
    assert(refreshed == Seq(("keep", 1L, 3L)))
  }
}
