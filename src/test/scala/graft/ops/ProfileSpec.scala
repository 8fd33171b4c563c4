package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class ProfileSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private lazy val df = Seq(
    (Some("a"), Some(1L)), (Some("b"), None),
    (Some("a"), Some(3L)), (None, Some(3L)))
    .toDF("s", "n")

  test("profile: counts, nulls, distincts, min/max as strings") {
    val got = Profile.profile(df, Seq("s", "n"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("s") == (("s", 4L, 1L, 2L, "a", "b")))
    assert(got("n") == (("n", 4L, 1L, 2L, "1", "3")))
  }

  test("approx profile agrees on small cardinalities") {
    val got = Profile.profile(df, Seq("s"), approx = true)
      .as[(String, Long, Long, Long, String, String)].collect().head
    assert(got._4 == 2L) // HLL exact at tiny n
  }

  test("sketches from disjoint batches merge to the union's distincts") {
    import org.apache.spark.sql.functions.lit
    val day1 = spark.range(0, 800).toDF("v").withColumn("g", lit("x"))
    val day2 = spark.range(600, 1400).toDF("v").withColumn("g", lit("x"))
    val stored = Profile.distinctSketches(day1, Seq("g"), Seq("v"))
      .unionByName(Profile.distinctSketches(day2, Seq("g"), Seq("v")))
    val est = Profile.mergeDistinctSketches(stored, Seq("g"))
      .select("n_distinct_est").as[Long].collect().head
    // exact union distinct = 1400; HLL default error ~2%
    assert(math.abs(est - 1400L) <= 1400 * 0.05, s"estimate $est")
    // and the state is tiny: one sketch row per (group, column, batch)
    assert(stored.count() == 2)
  }

  test("cms estimates are exact at gate scale and merge like a union") {
    import org.apache.spark.sql.functions.{col, explode, split}
    val a = Seq("x y x", "y z y").toDF("t")
      .select(explode(split(col("t"), " ")).as("w"))
    val b = Seq("x q", "q q").toDF("t")
      .select(explode(split(col("t"), " ")).as("w"))
    val sa = Profile.cmsOf(a, "w")
    val sb = Profile.cmsOf(b, "w")
    val merged = Profile.cmsMerge(sa, sb)
    val union = Profile.cmsOf(a.unionByName(b), "w")
    // estimates from the merged sketch equal the union-built sketch's
    // and both equal the true counts (wide sketch, no collisions)
    val batch = Seq("x", "y", "z", "q").toDF("w")
    val estM = Profile.estimateHot(batch, "w", merged, 1L)
      .as[(String, Long)].collect().toMap
    val estU = Profile.estimateHot(batch, "w", union, 1L)
      .as[(String, Long)].collect().toMap
    assert(estM == Map("x" -> 3L, "y" -> 3L, "z" -> 1L, "q" -> 3L))
    assert(estM == estU)
  }

  test("cms round-trips non-string key columns (sketch and estimate " +
      "must hash the same rendering)") {
    import org.apache.spark.sql.functions.col
    val df = spark.range(0, 30).select((col("id") % 3).as("k")) // longs
    val sk = Profile.cmsOf(df, "k")
    val est = Profile.estimateHot(df, "k", sk, 1L)
      .as[(String, Long)].collect().toMap
    assert(est == Map("0" -> 10L, "1" -> 10L, "2" -> 10L))
  }

  test("cms never undercounts, even when deliberately tiny") {
    import org.apache.spark.sql.functions.{col, concat, lit, pmod}
    // eps huge -> width tiny -> forced collisions; the estimate must
    // still be >= the true count for every key
    val df = spark.range(0, 2000)
      .select(concat(lit("k"), pmod(col("id"), lit(100))).as("w"))
    val sk = Profile.cmsOf(df, "w", eps = 0.5, confidence = 0.9)
    val est = Profile.estimateHot(df, "w", sk, 0L)
      .as[(String, Long)].collect().toMap
    assert(est.size == 100)
    assert(est.values.forall(_ >= 20L)) // true count is 20 each
  }

  test("exact profile is one aggregation pass (single Expand)") {
    val plan = Profile.profile(df, Seq("s", "n"))
      .queryExecution.executedPlan.toString
    assert("Expand".r.findAllIn(plan).length == 1)
    assert(!plan.contains("Join"), "profiling must not self-join")
  }

  test("poissonBootstrap: weights ~Poisson(1), exact and layout-free") {
    import spark.implicits._
    val df = (0L until 2000L).map(i => (i, 10L + i % 5)).toDF("id", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Profile.poissonBootstrap(d, col("id"), col("v"), b = 8)
        .collect().map(r => (r.getInt(0),
          (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val a = run(df)
    assert(a == run(df.repartition(13)), "layout changed the resamples")
    assert(a.keySet == (0 until 8).toSet)
    // each resample's effective n concentrates near the corpus size
    // (Poisson(1) mean weight 1; sd of the sum ~ sqrt(n) = 45)
    a.values.foreach { case (nEff, sumV, mean) =>
      assert(math.abs(nEff - 2000L) < 300, s"n_eff $nEff far from 2000")
      assert(mean > 11.0 && mean < 13.0, s"mean $mean off (true 12)")
      assert(sumV > 0)
    }
    // resamples genuinely differ (different draws per b)
    assert(a.values.map(_._1).toSet.size > 1)
  }

  test("signFlipTest: symmetric data gives p ~ 1, one-sided data gives " +
      "small p, resamples deterministic under layout") {
    import org.apache.spark.sql.functions._
    // perfectly antisymmetric differences: obs_diff = 0 -> every
    // flipped sum satisfies |s_b| >= 0 -> p = 1 exactly
    val sym = (1 to 100).map(i =>
      (i.toLong, if (i % 2 == 0) 5L else 0L,
        if (i % 2 == 0) 0L else 5L)).toDF("id", "a", "b")
    val p1 = Profile.signFlipTest(sym, col("id"), col("a"), col("b"), 200)
      .as[(Long, Long, Long, Long, Long, Double)].collect().head
    assert(p1 == ((100L, 0L, 200L, 201L, 201L, 1.0)))
    // strongly one-sided: a = b + 10 on every row -> no sign-flipped
    // sum of +-10s plausibly reaches 100*10 -> b_exceed 0, p = 1/201
    val oneSided = (1 to 100).map(i => (i.toLong, 20L, 10L))
      .toDF("id", "a", "b")
    val p2 = Profile.signFlipTest(
        oneSided, col("id"), col("a"), col("b"), 200)
      .as[(Long, Long, Long, Long, Long, Double)].collect().head
    assert(p2._2 == 1000L && p2._3 == 0L && p2._4 == 1L && p2._5 == 201L)
    // layout independence
    val p3 = Profile.signFlipTest(
        oneSided.repartition(13), col("id"), col("a"), col("b"), 200)
      .as[(Long, Long, Long, Long, Long, Double)].collect().head
    assert(p2 == p3)
  }

  test("cohenKappa: textbook confusion matrix, chance-level, perfect, " +
    "degenerate-constant, and null-exclusion cases") {
    import spark.implicits._
    def kappaOf(rows: Seq[(String, String)]): (Long, Long, Long, Long, Long, Double) =
      Profile.cohenKappa(rows.toDF("a", "b"), col("a"), col("b"))
        .as[(Long, Long, Long, Long, Long, Double)].collect().head
    // Cohen's canonical example: 20 yy, 5 yn, 10 ny, 15 nn ->
    // n=50, agree=35, pe_num = 25*30 + 25*20 = 1250,
    // kappa = (1750-1250)/(2500-1250) = 0.4
    val textbook =
      Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    assert(kappaOf(textbook) == ((50L, 35L, 1250L, 500L, 1250L, 0.4)))
    // marginals independent -> kappa exactly 0 despite 50% raw agreement
    assert(kappaOf(Seq(("y", "y"), ("y", "n"), ("n", "y"), ("n", "n")))._6
      == 0.0)
    // perfect agreement -> 1
    assert(kappaOf(Seq(("y", "y"), ("n", "n"), ("z", "z")))._6 == 1.0)
    // both annotators constant and equal: p_e = 1, kappa = 1 by
    // convention (not 0/0)
    assert(kappaOf(Seq(("y", "y"), ("y", "y")))._6 == 1.0)
    // null labels are abstentions: dropped from every count
    val withNulls: Seq[(String, String)] =
      textbook ++ Seq((null, "y"), ("y", null), (null, null))
    assert(kappaOf(withNulls) == kappaOf(textbook))
    // layout independence
    val re = Profile.cohenKappa(
        textbook.toDF("a", "b").repartition(7), col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Double)].collect().head
    assert(re == kappaOf(textbook))
  }

  test("calibrationBins/ece: hand-computed bins, top-bin edge at " +
    "score=1.0, exact nano-unit gap numerators") {
    import spark.implicits._
    // nano-unit surface: conf_sum = Σ round(score·1e9), gap_num =
    // |n_pos·1e9 − conf_sum| — all BIGINTs.
    // bin 1 [0.1,0.2): scores 0.1, 0.15 with labels (T, F):
    //   n=2, n_pos=1, conf_sum=250e6, gap=|1e9−250e6|=750e6 (=0.75·1e9)
    // bin 9 (top, includes 1.0): scores 0.95, 1.0, labels (T, T):
    //   n=2, n_pos=2, conf_sum=1950e6, gap=50e6 (=0.05·1e9)
    val rows = Seq(
      (0.1, true), (0.15, false), (0.95, true), (1.0, true))
      .toDF("score", "y")
    val bins = Profile.calibrationBins(rows, col("score"), col("y"))
      .select(col("bin"), col("n"), col("n_pos"), col("conf_sum"),
        col("gap_num"))
      .as[(Int, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(bins == Seq(
      (1, 2L, 1L, 250000000L, 750000000L),
      (9, 2L, 2L, 1950000000L, 50000000L)))
    // ECE = (0.75 + 0.05) / 4 = 0.2
    val e = Profile.ece(rows, col("score"), col("y"))
      .as[(Long, Double)].collect().head
    assert(e == ((4L, 0.2)))
    // a perfectly calibrated constant-score slice: score 0.5, half pos
    val cal = Seq((0.5, true), (0.5, false)).toDF("score", "y")
    assert(Profile.ece(cal, col("score"), col("y"))
      .as[(Long, Double)].collect().head == ((2L, 0.0)))
  }

  test("krippendorffAlpha: hand-computed 3-panel with missing ratings") {
    // u1 (a,a,a), u2 (a,a,b), u3 (b,b,-), u4 (a,-,-): u4 drops (m<2);
    // unscaled coincidences o_aa=4 o_ab=o_ba=1 o_bb=2, n=8, Do=2,
    // De=2*5*3=30, alpha = 1 - 7*2/30 = 16/30. Scaled by F=2:
    // do_num=4, de_num=16^2-(10^2+6^2)=120, alpha_num=64.
    val df = Seq(
      (1L, Some("a"), Some("a"), Some("a")),
      (2L, Some("a"), Some("a"), Some("b")),
      (3L, Some("b"), Some("b"), None),
      (4L, Some("a"), None, None)).toDF("u", "r1", "r2", "r3")
    val got = Profile.krippendorffAlpha(
        df, col("u"), Seq(col("r1"), col("r2"), col("r3")))
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(got == ((8L, 4L, 120L, 64L, 0.533333333)))
  }

  test("krippendorffAlpha: perfect agreement and the De=0 convention") {
    val perfect = Seq((1L, "x", "x"), (2L, "y", "y"))
      .toDF("u", "r1", "r2")
    val p = Profile.krippendorffAlpha(
        perfect, col("u"), Seq(col("r1"), col("r2")))
      .select("alpha").as[Double].collect().head
    assert(p == 1.0)
    // one global value: De = 0 -> alpha = 1 by convention
    val unanimous = Seq((1L, "x", "x"), (2L, "x", "x"))
      .toDF("u", "r1", "r2")
    val u = Profile.krippendorffAlpha(
        unanimous, col("u"), Seq(col("r1"), col("r2")))
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(u._3 == 0L && u._5 == 1.0)
  }

  test("krippendorffAlpha: panel bounds fail loudly") {
    val df = Seq((1L, "a")).toDF("u", "r1")
    val e = intercept[IllegalArgumentException] {
      Profile.krippendorffAlpha(df, col("u"), Seq(col("r1")))
    }
    assert(e.getMessage.contains(">= 2"))
    val e2 = intercept[IllegalArgumentException] {
      Profile.krippendorffAlpha(
        df, col("u"), Seq.fill(6)(col("r1")))
    }
    assert(e2.getMessage.contains("headroom"))
  }

  test("tokenFertility: exact sums and ratios, multibyte split") {
    val docs = Seq(("en", "aa bb"), ("en", "ccc"), ("fr", "é"))
      .toDF("lang", "text")
    val got = Profile.tokenFertility(
        docs, col("lang"), Text.regexTokens(col("text")), col("text"))
      .as[(String, Long, Long, Long, Long, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    // en: 3 tokens, 8 bytes, 8 chars
    assert(got("en") == (("en", 2L, 3L, 8L, 8L, 2.666667, 2.666667)))
    // fr: é = 1 token, 2 bytes, 1 char
    assert(got("fr") == (("fr", 1L, 1L, 2L, 1L, 2.0, 1.0)))
  }
}
