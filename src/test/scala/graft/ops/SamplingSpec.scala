package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private lazy val ids = spark.range(0, 10000).toDF("id")

  test("hexThreshold maps fractions onto the lexical hex grid") {
    assert(Sampling.hexThreshold(0.25) == "40000000")
    assert(Sampling.hexThreshold(0.5) == "80000000")
    assert(Sampling.hexThreshold(0.0) == "00000000")
    assert(Sampling.hexThreshold(1.0) == "g") // above every hex draw
  }

  test("sampleByHash is deterministic and partition-independent") {
    def run(parts: Int): Set[Long] =
      Sampling.sampleByHash(ids.repartition(parts), $"id", 0.2)
        .as[Long].collect().toSet
    val a = run(1)
    assert(run(32) == a)   // layout changes nothing
    assert(run(7) == a)
    val frac = a.size / 10000.0
    assert(math.abs(frac - 0.2) < 0.02, s"got $frac") // ~3.3 binomial sd
  }

  test("salt decorrelates two samples of the same keys") {
    val a = Sampling.sampleByHash(ids, $"id", 0.5, salt = "a")
      .as[Long].collect().toSet
    val b = Sampling.sampleByHash(ids, $"id", 0.5, salt = "b")
      .as[Long].collect().toSet
    val overlap = (a & b).size / 10000.0
    assert(math.abs(overlap - 0.25) < 0.02, s"got $overlap") // ≈ p²
  }

  test("splitAssign partitions every row exactly once, near weights") {
    val n = ids.count()
    val counts = ids
      .select(Sampling.splitAssign($"id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
      .groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.values.sum == n) // disjoint + exhaustive by construction
    assert(math.abs(counts("train") / n.toDouble - 0.8) < 0.02)
    assert(math.abs(counts("val") / n.toDouble - 0.1) < 0.02)
  }

  test("stratifiedSampleByHash applies per-stratum fractions") {
    val docs = ids.withColumn("grp",
      when($"id" % 2 === 0, "a").otherwise("b"))
    val kept = Sampling.stratifiedSampleByHash(
        docs, $"id", $"grp", Map("a" -> 0.5), default = 0.1)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(math.abs(kept("a") / 5000.0 - 0.5) < 0.04)
    assert(math.abs(kept("b") / 5000.0 - 0.1) < 0.04)
  }

  test("sampleKPerGroup: exactly k per group, partition-independent, " +
      "no window in the plan") {
    val docs = ids.withColumn("grp", ($"id" % 3).cast("string"))
    def run(parts: Int): Set[Long] =
      Sampling.sampleKPerGroup(
          docs.repartition(parts), Seq("grp"), $"id", k = 7, tie = "id")
        .select("id").as[Long].collect().toSet
    val a = run(4)
    assert(a.size == 21) // 3 groups x 7
    assert(run(17) == a) // layout-independent membership
    val counts = Sampling.sampleKPerGroup(
        docs, Seq("grp"), $"id", k = 7, tie = "id")
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ == 7L))
    // small groups yield the whole group, not an error
    val tiny = Sampling.sampleKPerGroup(
        docs.filter($"id" < 4), Seq("grp"), $"id", k = 7, tie = "id")
      .count()
    assert(tiny == 4L)
    val plan = Sampling.sampleKPerGroup(
        docs, Seq("grp"), $"id", k = 7, tie = "id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup") && !plan.contains("Window"))
  }

  test("topQuantileFilter agrees with the exact percent-rank face") {
    // distinct scores: at high accuracy the approx sketch is exact, so
    // the scale path must reproduce the exact top-quartile membership
    val scored = spark.range(0, 2000)
      .select($"id", ($"id" % 4).cast("string").as("grp"),
        (xxhash64($"id") % 100000).cast("double").as("score"))
    val exact = Sampling.percentRankTopFraction(
        scored, Seq("grp"), $"score", 0.25)
      .select("id").as[Long].collect().toSet
    val approx = Sampling.topQuantileFilter(
        scored, Seq("grp"), $"score", 0.25)
      .select("id").as[Long].collect().toSet
    val jac = (exact & approx).size.toDouble / (exact | approx).size
    assert(jac > 0.98, s"exact=${exact.size} approx=${approx.size} j=$jac")
  }

  test("topQuantileFilter plan: broadcast threshold join, no window sort") {
    val scored = ids.select($"id", ($"id" % 4).cast("string").as("grp"),
      $"id".cast("double").as("score"))
    val plan = Sampling.topQuantileFilter(scored, Seq("grp"), $"score", 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("Window"), "scale path must not sort per group")
  }

  test("weightedMix: per-source rates hold; shared keys decorrelate") {
    val a = ids.select($"id", lit("a").as("src"))
    val b = ids.select($"id", lit("b").as("src")) // same keys as a
    val mixed = Sampling.weightedMix(Seq(a -> 0.5, b -> 0.5), "id")
      .select("id", "src").as[(Long, String)].collect()
    val aKept = mixed.filter(_._2 == "a").map(_._1).toSet
    val bKept = mixed.filter(_._2 == "b").map(_._1).toSet
    assert(math.abs(aKept.size - 5000) < 250 && math.abs(bKept.size - 5000) < 250)
    // indexed salts: the same id draws independently per source
    assert(aKept != bKept, "sources sharing keys must draw independently")
    // weight 1.0 keeps everything, weight 0 keeps nothing
    assert(Sampling.weightedMix(Seq(a -> 1.0), "id").count() == 10000)
    assert(Sampling.weightedMix(Seq(a -> 0.0), "id").count() == 0)
  }

  test("takeTokenBudget: cumulative cut in draw order, per shard") {
    val docs = ids.select($"id", ($"id" % 2).cast("string").as("shard"),
      lit(10L).as("toks"))
    val kept = Sampling.takeTokenBudget(
        docs, Seq("shard"), $"id", $"toks", budget = 200L)
      .groupBy("shard").count().as[(String, Long)].collect().toMap
    // 10 tokens/row → exactly 20 rows per shard fit the 200 budget
    assert(kept == Map("0" -> 20L, "1" -> 20L))
    // determinism: same slice on a different layout
    val again = Sampling.takeTokenBudget(
        docs.repartition(13), Seq("shard"), $"id", $"toks", budget = 200L)
      .select("id").as[Long].collect().toSet
    val first = Sampling.takeTokenBudget(
        docs, Seq("shard"), $"id", $"toks", budget = 200L)
      .select("id").as[Long].collect().toSet
    assert(again == first)
  }

  test("weightedSampleKPerGroup: exactly k, positive weights only, " +
      "deterministic") {
    val df = (1L to 40L).map(i =>
        (i, "g", if (i <= 35) i.toDouble else -1.0))
      .toDF("id", "g", "w")
    val got = Sampling.weightedSampleKPerGroup(
        df, Seq("g"), col("id"), col("w"), k = 8, tie = "id", salt = "t")
      .select("id").as[Long].collect().toSet
    assert(got.size == 8)
    assert(got.forall(_ <= 35L), "a non-positive-weight row was sampled")
    val again = Sampling.weightedSampleKPerGroup(
        df.repartition(7), Seq("g"), col("id"), col("w"),
        k = 8, tie = "id", salt = "t")
      .select("id").as[Long].collect().toSet
    assert(again == got, "sample depends on layout")
  }

  test("weightedSampleKPerGroup: inclusion odds track the weight " +
      "(A-ES property, measured over independent salts)") {
    // one heavy row (weight 30) among 29 light rows (weight 1),
    // k=3 of 30: P(heavy in sample) should be near 1, far above the
    // ~3/30 a uniform sampler would give
    val df = (1L to 30L).map(i =>
        (i, "g", if (i == 7L) 30.0 else 1.0)).toDF("id", "g", "w")
    val hits = (1 to 25).count { s =>
      Sampling.weightedSampleKPerGroup(
          df, Seq("g"), col("id"), col("w"), k = 3, tie = "id",
          salt = s"s$s")
        .select("id").as[Long].collect().contains(7L)
    }
    assert(hits >= 18, s"heavy row sampled only $hits/25 times")
  }

  test("negativeSamples: k probes per anchor (minus self-collisions), " +
    "negatives from the corpus, never the anchor itself, deterministic " +
    "and partition-independent") {
    val corpus = (1L to 200L).map(i => (i, s"d$i")).toDF("id", "t")
    val anchors = corpus.filter(col("id") <= 10)
    def run(c: org.apache.spark.sql.DataFrame) =
      Sampling.negativeSamples(anchors, "id", c, "id",
          k = 4, buckets = 32, salt = "t")
        .select("anchor_id", "probe", "negative_id")
        .as[(Long, Int, Long)].collect().toSet
    val got = run(corpus)
    assert(got == run(corpus.repartition(13)), "layout changed the sample")
    val byAnchor = got.groupBy(_._1)
    assert(byAnchor.keySet == (1L to 10L).toSet)
    byAnchor.foreach { case (a, rows) =>
      assert(rows.size >= 3 && rows.size <= 4,
        s"anchor $a got ${rows.size} negatives (k=4, <=1 self-collision)")
      assert(rows.forall(_._3 != a), s"anchor $a sampled itself")
      assert(rows.forall(r => r._3 >= 1L && r._3 <= 200L))
    }
    // distribution sanity: across anchors the negatives are spread,
    // not one bucket's representative repeated everywhere
    assert(got.map(_._3).size >= 8, "negatives collapsed to few docs")
  }

  test("temperatureMix flattens head domains toward uniform") {
    // head domain 800 rows, tail 50: α=1/2 rates rebalance the mix
    val rows = (0L until 800L).map(i => (i, "head")) ++
      (800L until 850L).map(i => (i, "tail"))
    val df = rows.toDF("id", "dom")
    val kept = Sampling.temperatureMix(df, "dom", col("id"),
        targetRows = 200, salt = "t")
      .groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (h, t) = (kept.getOrElse("head", 0L), kept.getOrElse("tail", 0L))
    // input ratio 16:1; √-flattened target ratio is 4:1 — the head
    // must be well under its input share and the tail oversampled
    assert(h + t > 140 && h + t < 260, s"total $h+$t far from target 200")
    assert(h.toDouble / t < 8.0, s"head/tail $h/$t not flattened")
    assert(t > 20, s"tail undersampled: $t")
  }

  test("calibrateMix hits explicit target shares; unlisted and null " +
      "domains drop; small domains clamp at keep-all") {
    val rows = (0L until 1000L).map { i =>
      val dom = if (i % 11 == 0) null
        else if (i < 700) "web" else if (i < 950) "code" else "tiny"
      (i, dom)
    }
    val df = rows.toDF("id", "dom")
    val kept = Sampling.calibrateMix(df, "dom", col("id"),
        Map("web" -> 0.5, "tiny" -> 0.5), targetRows = 80, salt = "c")
      .groupBy("dom").count().collect()
      .map(r => Option(r.getString(0)).getOrElse("NULL") -> r.getLong(1))
      .toMap
    // code (unlisted) and null must vanish entirely
    assert(!kept.contains("code") && !kept.contains("NULL"), s"got $kept")
    // web targets 40 of ~636 rows; tiny targets 40 but only has ~45
    // non-null rows -> clamps near keep-all
    assert(kept("web") > 20 && kept("web") < 65, s"web ${kept("web")}")
    assert(kept("tiny") > 30, s"tiny clamp failed: ${kept("tiny")}")
  }

  test("temperatureMix is layout-independent and keeps null domains") {
    val rows = (0L until 300L).map { i =>
      (i, if (i % 7 == 0) null else s"d${i % 3}")
    }
    val df = rows.toDF("id", "dom")
    def ids(d: org.apache.spark.sql.DataFrame) =
      Sampling.temperatureMix(d, "dom", col("id"), 150, "s")
        .select("id").collect().map(_.getLong(0)).toSet
    val a = ids(df)
    assert(a == ids(df.repartition(17)), "layout changed membership")
    // the null group participates with its own rate rather than
    // silently dropping (the null-safe join contract)
    val keptNull = Sampling.temperatureMix(df, "dom", col("id"), 150, "s")
      .filter(col("dom").isNull).count()
    assert(keptNull > 0, "null-domain rows were dropped wholesale")
  }

  test("epochPlan: exact rationals, cap binds only past `cap` epochs, " +
      "planned tokens follow the capped allocation") {
    import org.apache.spark.sql.functions._
    // two domains, tokens 100 and 1000; budget 4000 over |S| = 2
    // gives 2000 tokens each: small domain -> 20 epochs (capped at 4),
    // big domain -> 2 epochs (uncapped)
    val df = ((1 to 1).map(i => (s"s$i", "small", 100L)) ++
      (1 to 1).map(i => (s"b$i", "big", 1000L)))
      .toDF("id", "dom", "tok")
    val got = Sampling.epochPlan(df, "dom", col("tok"),
        budget = 4000L, cap = 4L)
      .as[(String, Long, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    // small: 4000 / (2*100) = 20 epochs -> capped 4 -> 400 tokens
    assert(got("small") == (("small", 100L, 4000L, 200L, 20.0, 4.0, 400.0)))
    // big: 4000 / (2*1000) = 2 epochs -> uncapped -> 2000 tokens
    assert(got("big") == (("big", 1000L, 4000L, 2000L, 2.0, 2.0, 2000.0)))
  }
}
