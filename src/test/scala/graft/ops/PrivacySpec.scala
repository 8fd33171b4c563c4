package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PrivacySpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private val rows = (1L to 500L).map(i => (i, s"g${i % 5}")).toDF("id", "g")

  test("noise is Laplace-shaped: zero-mean-ish, scale tracks 1/epsilon") {
    // across many groups the draw is uniform; |noise| quantiles must
    // scale with b = 1/eps (Laplace median |noise| = b ln 2)
    val many = (1L to 4000L).map(i => (i, s"k$i")).toDF("id", "g")
    def absNoise(eps: Double) = Privacy.laplaceNoisyCounts(many, "g", eps,
        salt = "s1")
      .select(abs(col("noisy_n") - col("n"))).as[Double].collect().sorted
    val n1 = absNoise(1.0)
    val n4 = absNoise(4.0)
    val med1 = n1(n1.length / 2)
    val med4 = n4(n4.length / 2)
    assert(math.abs(med1 / (math.log(2.0)) - 1.0) < 0.15,
      s"eps=1 median |noise| ${med1} should be ~ln2")
    assert(math.abs(med1 / med4 - 4.0) < 0.8,
      s"scale must track 1/eps: $med1 vs $med4")
  }

  test("deterministic per (group, salt); decorrelated across salts; " +
    "partition-independent") {
    def release(salt: String, df: org.apache.spark.sql.DataFrame) =
      Privacy.laplaceNoisyCounts(df, "g", 0.5, salt)
        .as[(String, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    val a = release("r1", rows)
    val b = release("r1", rows.repartition(13))
    assert(a == b, "same salt + data must reproduce the release exactly")
    val c = release("r2", rows)
    assert(a.keys == c.keys &&
      a.exists { case (k, v) => c(k) != v },
      "a fresh salt must redraw the noise")
    // true counts are 100 per group; releases differ from truth
    assert(a.values.forall(_._1 == 100L))
  }

  test("secret-salt mode: independently drawn releases are statistically " +
    "decorrelated; public-salt mode stays byte-reproducible") {
    // the deployment contract from the scaladoc honesty note: a PUBLIC
    // (input-derived) salt gives a reproducible, oracle-checkable
    // release; a SECRET fresh-per-release salt gives proper independent
    // Laplace draws. Prove both behaviors on the same data.
    val many = (1L to 3000L).map(i => (i, s"k$i")).toDF("id", "g")
    def noises(salt: String): Map[String, Double] =
      Privacy.laplaceNoisyCounts(many, "g", 1.0, salt)
        .select(col("g"), (col("noisy_n") - col("n")).as("e"))
        .as[(String, Double)].collect().toMap
    // secret-salt path: two fresh secrets (SecureRandom — what a real
    // release would mint)
    val rnd = new java.security.SecureRandom()
    def freshSecret() = new java.math.BigInteger(128, rnd).toString(16)
    val r1 = noises(freshSecret())
    val r2 = noises(freshSecret())
    val keys = r1.keys.toSeq
    // sign agreement ≈ 50% for independent symmetric draws
    val agree = keys.count(k => math.signum(r1(k)) == math.signum(r2(k)))
    assert(math.abs(agree.toDouble / keys.size - 0.5) < 0.05,
      s"independent releases must decorrelate: sign agreement $agree/${keys.size}")
    // Pearson correlation ≈ 0
    val (m1, m2) = (r1.values.sum / keys.size, r2.values.sum / keys.size)
    val cov = keys.map(k => (r1(k) - m1) * (r2(k) - m2)).sum
    val v1 = keys.map(k => math.pow(r1(k) - m1, 2)).sum
    val v2 = keys.map(k => math.pow(r2(k) - m2, 2)).sum
    val corr = cov / math.sqrt(v1 * v2)
    assert(math.abs(corr) < 0.06,
      s"independent releases must be uncorrelated: r=$corr")
    // public-salt path: same salt reproduces the release exactly, at
    // any partitioning
    val pub = "release-2026-08-14" // derived from public metadata
    assert(noises(pub) == Privacy.laplaceNoisyCounts(
        many.repartition(11), "g", 1.0, pub)
      .select(col("g"), (col("noisy_n") - col("n")).as("e"))
      .as[(String, Double)].collect().toMap,
      "public-salt releases must be byte-reproducible")
  }

  test("kAnonymize suppresses rare combinations, keeps common ones, " +
    "and treats NULL as a combination") {
    val df = Seq(
      (1L, Option("a"), "x"), (2L, Option("a"), "x"), (3L, Option("a"), "x"),
      (4L, Option("b"), "x"), // singleton combination -> suppressed
      (5L, None, "y"), (6L, None, "y"), (7L, None, "y") // null group, n=3
    ).toDF("id", "q1", "q2")
    val got = Privacy.kAnonymize(df, Seq("q1", "q2"), k = 3)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L, 5L, 6L, 7L),
      "n>=3 combinations survive, including the NULL one; singletons drop")
  }

  test("lDiversify keeps cells with >= l distinct sensitive values; " +
    "a big uniform cell is suppressed; null sensitive doesn't count") {
    val df = Seq(
      // big cell, but everyone shares one diagnosis -> suppressed at l=2
      (1L, "a", "flu"), (2L, "a", "flu"), (3L, "a", "flu"), (4L, "a", "flu"),
      // small cell with two distinct values -> kept
      (5L, "b", "flu"), (6L, "b", "cold"),
      // nulls don't count toward diversity: effectively 1 distinct
      (7L, "c", "flu"), (8L, "c", null)
    ).toDF("id", "q", "dx")
    val got = Privacy.lDiversify(df, Seq("q"), "dx", l = 2)
      .select("id").as[Long].collect().toSet
    assert(got == Set(5L, 6L))
  }

  test("tCloseness: skewed cells breach, representative cells pass, " +
      "missing values still contribute distance") {
    // corpus: 8 flu, 8 cold (p = 1/2 each). Group a mirrors the
    // corpus (TVD 0); group b is all-flu (TVD 1/2 > 1/5 — breach);
    // group c has NO cold rows, so the missing cell must contribute
    // |0 - n_v·n_g| or its TVD would read 0
    val df = (
      (1 to 4).map(i => (i.toLong, "a", "flu")) ++
      (5 to 8).map(i => (i.toLong, "a", "cold")) ++
      (9 to 12).map(i => (i.toLong, "b", "flu")) ++
      (13 to 16).map(i => (i.toLong, "c", "cold"))
    ).toDF("id", "q", "dx")
    val got = Privacy.tCloseness(df, Seq("q"), "dx", tNum = 1, tDen = 5)
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // N = 16, flu total 8, cold total 8
    // a: n_g=8, cells (4,4): |4·16−8·8| = 0 twice → tvd 0/256 — pass
    assert(got("a") == ("a", 8L, 0L, 256L, false))
    // b: n_g=4, flu |4·16−8·4|=32, cold |0−8·4|=32 → 64/128 = 1/2 — breach
    assert(got("b") == ("b", 4L, 64L, 128L, true))
    // c: all-cold — symmetric to b, must also breach via the zero cell
    assert(got("c") == ("c", 4L, 64L, 128L, true))
  }

  test("tCloseness is layout-independent") {
    val df = (1 to 40).map(i =>
      (i.toLong, s"g${i % 3}", s"v${i % 5}")).toDF("id", "q", "dx")
    val a = Privacy.tCloseness(df, Seq("q"), "dx", 1, 5)
      .as[(String, Long, Long, Long, Boolean)].collect().toSet
    val b = Privacy.tCloseness(df.repartition(17), Seq("q"), "dx", 1, 5)
      .as[(String, Long, Long, Long, Boolean)].collect().toSet
    assert(a == b)
  }

  test("laplaceNoisySums: the clip binds per user inside a group, the " +
      "noise is the count-release mechanism scaled by clip/eps") {
    // group g: user 1 contributes 80 (clipped to 50), user 2 raw 30
    val df = Seq(
      ("g", 1L, 50L), ("g", 1L, 30L), ("g", 2L, 30L),
      ("h", 3L, 10L)).toDF("grp", "u", "v")
    val got = Privacy.laplaceNoisySums(
        df, "grp", "u", col("v"), clip = 50L, epsilon = 0.5, "s1")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("g")._2 == 2L && got("g")._3 == 80L,
      s"clip must bound user 1 at 50: ${got("g")}")
    assert(got("h")._3 == 10L)
    // the noise equals the count mechanism's draw scaled by clip/eps
    val cnt = Privacy.laplaceNoisyCounts(
        df.select(col("grp")), "grp", epsilon = 1.0, "s1")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._3 - r._2)).toMap
    val sumNoise = got("g")._4 - got("g")._3
    assert(math.abs(sumNoise - 100.0 * cnt("g")) < 2e-7,
      s"sum noise $sumNoise vs scaled count noise ${100.0 * cnt("g")}")
    // deterministic across layouts
    val again = Privacy.laplaceNoisySums(
        df.repartition(7), "grp", "u", col("v"), 50L, 0.5, "s1")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(again == got)
  }

  test("noise is finite for every possible draw bucket edge") {
    // the +0.5 offset keeps u off 1/2 exactly and the ln argument
    // >= 2^-32 — no infinities however the md5 lands
    val vals = Privacy.laplaceNoisyCounts(rows, "g", 0.1, "edge")
      .select(col("noisy_n")).as[Double].collect()
    assert(vals.forall(v => !v.isNaN && !v.isInfinite))
  }
}
