package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DriftSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private def psi(ref: Seq[String], cur: Seq[String]): Double =
    Drift.psiBinned(ref.toDF("bin"), cur.toDF("bin"), "bin")
      .agg(sum(col("psi_term").cast("decimal(38,9)")).cast("double"))
      .as[Double].first()

  test("identical distributions score (near) zero") {
    val xs = Seq.fill(40)("a") ++ Seq.fill(30)("b") ++ Seq.fill(30)("c")
    // smoothing keeps p == q exactly when counts AND totals agree
    assert(psi(xs, xs) == 0.0)
  }

  test("drift is positive and grows with the shift") {
    val ref = Seq.fill(50)("a") ++ Seq.fill(50)("b")
    val mild = Seq.fill(60)("a") ++ Seq.fill(40)("b")
    val wild = Seq.fill(95)("a") ++ Seq.fill(5)("b")
    val (m, w) = (psi(ref, mild), psi(ref, wild))
    assert(m > 0.0 && w > m, s"expected 0 < $m < $w")
  }

  test("a bin present on only one side stays finite and penalized") {
    val ref = Seq.fill(50)("a") ++ Seq.fill(50)("b")
    val cur = Seq.fill(50)("a") ++ Seq.fill(50)("zz") // b vanished, zz new
    val terms = Drift.psiBinned(ref.toDF("bin"), cur.toDF("bin"), "bin")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(terms.keySet == Set("a", "b", "zz"))
    assert(terms("b") > 0.0 && terms("zz") > 0.0,
      "vanished and novel bins must both contribute positive penalty")
    assert(terms.values.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("result is partition-independent") {
    val rnd = new scala.util.Random(11)
    val ref = Seq.fill(200)(s"k${rnd.nextInt(7)}")
    val cur = Seq.fill(150)(s"k${rnd.nextInt(5)}")
    val a = psi(ref, cur)
    val b = Drift.psiBinned(
        ref.toDF("bin").repartition(13), cur.toDF("bin").repartition(3), "bin")
      .agg(sum(col("psi_term").cast("decimal(38,9)")).cast("double"))
      .as[Double].first()
    assert(a == b, "decimal-grid term sum must not depend on partitioning")
  }

  test("equiDepthBins: near-equal buckets, exact rank arithmetic, " +
    "partition-independent") {
    val df = (1L to 103L).map(i => (i, (i * 37) % 103)).toDF("id", "v")
    val got = Drift.equiDepthBins(
        df, Seq(col("v").asc, col("id").asc), k = 4, numPartitions = 5)
      .select(col("id"), col("bin")).as[(Long, Long)].collect().toMap
    val sizes = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(got.values.toSet == Set(0L, 1L, 2L, 3L))
    assert(sizes.values.max - sizes.values.min <= 1,
      s"buckets must be equal within one row: $sizes")
    val again = Drift.equiDepthBins(
        df.repartition(11), Seq(col("v").asc, col("id").asc),
        k = 4, numPartitions = 3)
      .select(col("id"), col("bin")).as[(Long, Long)].collect().toMap
    assert(got == again, "bin assignment must not depend on partitioning")
  }

  test("refCutpoints + applyCutpoints: train bins stamp serving data, " +
    "duplicate-heavy reference stays deterministic") {
    val ref = (1L to 100L).map(v => Tuple1(v.toDouble)).toDF("v")
    val cuts = Drift.refCutpoints(ref, col("v"), k = 4, numPartitions = 3)
      .as[Seq[Double]].first()
    assert(cuts == Seq(26.0, 51.0, 76.0))
    val serve = Seq(0.5, 25.9, 26.0, 50.0, 51.0, 99.0, 5000.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = Drift.applyCutpoints(serve, col("v"), cuts = Drift.refCutpoints(
        ref, col("v"), k = 4, numPartitions = 3))
      .select(col("id"), col("bin")).as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L,
      5L -> 3L, 6L -> 3L))
    // ranks within duplicates are arbitrary, cut VALUES are not: a
    // reference that is 90% one value yields the same cuts at any
    // partitioning
    val dup = (Seq.fill(90)(7.0) ++ Seq(1.0, 2.0, 3.0, 4.0, 8.0, 9.0,
      10.0, 11.0, 12.0, 13.0)).map(Tuple1(_)).toDF("v")
    val c1 = Drift.refCutpoints(dup, col("v"), 4, 2).as[Seq[Double]].first()
    val c2 = Drift.refCutpoints(dup.repartition(9), col("v"), 4, 5)
      .as[Seq[Double]].first()
    assert(c1 == c2, s"cutpoints must be partition-independent: $c1 vs $c2")
  }

  test("applyCutpoints propagates NULL values to a NULL bin instead of " +
    "merging them into bin 0") {
    val ref = (1L to 100L).map(v => Tuple1(v.toDouble)).toDF("v")
    val cuts = Drift.refCutpoints(ref, col("v"), k = 4, numPartitions = 3)
    val serve = Seq((1L, Some(0.5)), (2L, None), (3L, Some(99.0)))
      .toDF("id", "v")
    val got = Drift.applyCutpoints(serve, col("v"), cuts)
      .select(col("id"), col("bin")).as[(Long, Option[Long])]
      .collect().toMap
    assert(got == Map(1L -> Some(0L), 2L -> None, 3L -> Some(3L)))
  }

  test("embeddingShift: zero on identical slices, exact gap on a " +
    "planted shift, partition-independent") {
    import java.math.{BigDecimal => JBD}
    val base = (1L to 20L).map(i =>
      (i, Array(0.25f, -0.5f, 1.0f))).toDF("id", "v")
    val same = Drift.embeddingShift(base, base, "v")
      .select(col("d_u")).as[JBD].collect()
    assert(same.forall(_.longValueExact() == 0L))
    // shift dim 0 by exactly +0.1: s_cur(0) = s_ref(0) + 20*1e8;
    // d(0) = |s_ref*20 - (s_ref + 2e9)*20| = 4e10; other dims 0
    val shifted = (1L to 20L).map(i =>
      (i, Array(0.35f, -0.5f, 1.0f))).toDF("id", "v")
    val got = Drift.embeddingShift(base, shifted, "v")
      .select(col("j"), col("d_u")).as[(Long, JBD)].collect()
      .map { case (j, d) => j -> d.longValueExact() }.toMap
    assert(got(1L) == 0L && got(2L) == 0L)
    assert(got(0L) == 20L * 20L * math.round(0.35f.toDouble * 1e9 - 0.25f.toDouble * 1e9))
    val again = Drift.embeddingShift(base.repartition(7), shifted, "v")
      .select(col("j"), col("d_u")).as[(Long, JBD)].collect()
      .map { case (j, d) => j -> d.longValueExact() }.toMap
    assert(again == got)
  }

  test("psiBinnedBy equals per-group psiBinned run independently") {
    val rnd = new scala.util.Random(23)
    val groups = Seq("g1", "g2", "g3")
    val ref = groups.flatMap(g =>
      Seq.fill(120)((g, s"k${rnd.nextInt(6)}")))
    val cur = groups.flatMap(g =>
      Seq.fill(80)((g, s"k${rnd.nextInt(4)}")))
    val fanned = Drift.psiBinnedBy(
        ref.toDF("grp", "bin"), cur.toDF("grp", "bin"), "grp", "bin")
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    val solo = groups.flatMap { g =>
      Drift.psiBinned(
          ref.filter(_._1 == g).map(_._2).toDF("bin"),
          cur.filter(_._1 == g).map(_._2).toDF("bin"), "bin")
        .as[(String, Long, Long, Double)].collect()
        .map(r => (g, r._1) -> (r._2, r._3, r._4))
    }.toMap
    assert(fanned == solo,
      "one-pass fan-out must reproduce each group's standalone PSI terms")
  }

  test("ksBinned: exact cross-multiplied CDF gaps, zero on identical, " +
    "detects a location shift PSI-equivalent mass moves would hide") {
    import java.math.{BigDecimal => JBD}
    def ks(ref: Seq[Long], cur: Seq[Long]): Map[Long, JBD] =
      Drift.ksBinned(ref.toDF("bin"), cur.toDF("bin"), "bin")
        .select(col("bin"), col("d_u"))
        .as[(Long, JBD)].collect().toMap
    // hand-computed: ref {0:3, 1:1}, cur {0:1, 1:3} -> d = |3*4-1*4|=8
    // at bin 0, |4*4-4*4|=0 at bin 1; D = 8/(4*4) = 0.5, the true KS
    val got = ks(Seq(0L, 0L, 0L, 1L), Seq(0L, 1L, 1L, 1L))
    assert(got.view.mapValues(_.longValueExact()).toMap ==
      Map(0L -> 8L, 1L -> 0L))
    // identical distributions: every gap is exactly zero
    val same = ks(Seq(0L, 0L, 1L, 2L), Seq(0L, 0L, 1L, 2L))
    assert(same.values.forall(_.longValueExact() == 0L))
    // a pure location shift maximizes the mid-CDF gap
    val shifted = ks((1L to 100L).map(_ % 10), (1L to 100L).map(v => v % 10 + 5))
    assert(shifted.values.map(_.longValueExact()).max > 0L)
  }

  test("binOf floors onto the width grid, negative-safe") {
    val got = Seq(-2001L, -2000L, -1L, 0L, 1999L, 2000L, 4001L)
      .toDF("v").select(Drift.binOf(col("v"), 2000L).as("b"))
      .as[Long].collect().toSeq
    assert(got == Seq(-2L, -1L, -1L, 0L, 0L, 1L, 2L))
  }

  test("chi2Test: hand-computed 2x2, independence gives ~0, zero cells count") {
    // cells a/0=10 a/1=20 b/0=30 b/1=40: e = 12,18,28,42 ->
    // chi2 = 4/12+4/18+4/28+4/42 = 200/252, summed on the 9-grid
    val df22 = (Seq.fill(10)(("a", 0)) ++ Seq.fill(20)(("a", 1)) ++
      Seq.fill(30)(("b", 0)) ++ Seq.fill(40)(("b", 1)))
      .toDF("cat", "sl")
    val got = Drift.chi2Test(df22, col("cat"), col("sl"))
      .as[(Long, Long, Double)].collect().head
    assert(got._1 == 100L && got._2 == 1L)
    assert(got._3 == 0.793650793, s"chi2 ${got._3}")
    // perfect independence: every cell at its expectation -> chi2 = 0
    val ind = (Seq.fill(10)(("a", 0)) ++ Seq.fill(10)(("a", 1)) ++
      Seq.fill(20)(("b", 0)) ++ Seq.fill(20)(("b", 1)))
      .toDF("cat", "sl")
    assert(Drift.chi2Test(ind, col("cat"), col("sl"))
      .select("chi2").as[Double].collect().head == 0.0)
    // a structurally-zero cell contributes its full expected term
    val z = (Seq.fill(10)(("a", 0)) ++ Seq.fill(10)(("b", 1)))
      .toDF("cat", "sl")
    val gz = Drift.chi2Test(z, col("cat"), col("sl"))
      .as[(Long, Long, Double)].collect().head
    assert(gz == ((20L, 1L, 20.0)), s"saturated 2x2 must give chi2=n: $gz")
  }
}
