package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Fellegi-Sunter EM ([[Linkage]]) on a PLANTED two-class mixture:
  * pattern counts are the exact expected counts of a known (λ, m, u),
  * so the fit's job — recover the separation without labels — has a
  * ground truth to check against. The arithmetic contract (ppm grid,
  * truncating div) is what the DuckDB oracle of q_fs_em replays.
  */
class LinkageSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private val Ppm = Linkage.Ppm

  /** Exact expected pattern counts of a planted mixture over N pairs:
    * n(g) = N·(λ·Π p_m ± + (1−λ)·Π p_u ±), computed in doubles and
    * rounded — the generator, NOT the integer EM under test. */
  private def plant(
      n: Long, lam: Double, m: Seq[Double], u: Seq[Double])
      : Seq[(Seq[Int], Long)] = {
    val f = m.size
    (0 until (1 << f)).map { bits =>
      val g = (0 until f).map(i => (bits >> i) & 1)
      val pm = g.zipWithIndex.map { case (b, i) =>
        if (b == 1) m(i) else 1 - m(i) }.product
      val pu = g.zipWithIndex.map { case (b, i) =>
        if (b == 1) u(i) else 1 - u(i) }.product
      (g, math.round(n * (lam * pm + (1 - lam) * pu)))
    }
  }

  private val planted =
    plant(100000L, 0.2, Seq(0.9, 0.8, 0.7), Seq(0.1, 0.2, 0.3))

  test("EM recovers the planted separation unsupervised") {
    val p = Linkage.emFit(planted, iters = 20)
    // every field separates the two classes the right way around
    (0 until 3).foreach { i =>
      assert(p.m(i) > p.u(i) + 100000L,
        s"field $i: m=${p.m(i)} u=${p.u(i)} — no separation recovered")
    }
    // prevalence lands near the planted 0.2 (±0.05)
    assert(math.abs(p.lambda - 200000L) < 50000L,
      s"lambda=${p.lambda} far from the planted 200000")
    // and near the planted per-field rates (±0.08 on the ppm grid)
    Seq(900000L, 800000L, 700000L).zip(p.m).foreach { case (want, got) =>
      assert(math.abs(got - want) < 80000L, s"m: want≈$want got $got")
    }
    Seq(100000L, 200000L, 300000L).zip(p.u).foreach { case (want, got) =>
      assert(math.abs(got - want) < 80000L, s"u: want≈$want got $got")
    }
  }

  test("all fitted parameters stay on the ppm grid") {
    val p = Linkage.emFit(planted, iters = 20)
    (p.lambda +: (p.m ++ p.u)).foreach { v =>
      assert(v >= 0L && v <= Ppm, s"parameter $v off the [0, 10^6] grid")
    }
  }

  test("posterior is monotone in agreement when every m > u") {
    val p = Linkage.emFit(planted, iters = 20)
    val post = (0 until 8).map { bits =>
      (bits, Linkage.posteriorPpm(Seq(bits & 1, (bits >> 1) & 1,
        (bits >> 2) & 1), p))
    }.toMap
    // adding one agreement bit never lowers the posterior
    for (bits <- 0 until 8; i <- 0 until 3 if (bits & (1 << i)) == 0) {
      assert(post(bits | (1 << i)) >= post(bits),
        s"pattern ${bits | (1 << i)} scored below its subset $bits")
    }
  }

  test("fsScore triages the planted extremes and counts every pair") {
    val pairs = plant(5000L, 0.2, Seq(0.9, 0.8, 0.7), Seq(0.1, 0.2, 0.3))
      .flatMap { case (g, n) => Seq.fill(n.toInt)((g(0), g(1), g(2))) }
      .toDF("g1", "g2", "g3")
    val scored = Linkage.fsScore(pairs, Seq("g1", "g2", "g3"),
      iters = 20, hiPpm = 800000L, loPpm = 10000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(3)))
    assert(scored.map(_._2).sum == pairs.count())
    val byPat = scored.map(t => t._1 -> t._3).toMap
    assert(byPat("111") == "match", s"full agreement → ${byPat("111")}")
    assert(byPat("000") == "non_match", s"zero agreement → ${byPat("000")}")
  }

  test("patternCounts is bounded by 2^F and conserves the pair count") {
    val pairs = Seq((1, 0, 1), (1, 0, 1), (0, 0, 0), (1, 1, 1))
      .toDF("a", "b", "c")
    val pc = Linkage.patternCounts(pairs, Seq("a", "b", "c")).collect()
    assert(pc.length <= 8)
    assert(pc.map(_.getAs[Long]("n")).sum == 4L)
  }

  test("degenerate inputs: a single observed pattern fits without " +
      "division blowups and stays on the grid") {
    // all pairs fully agree — no mixture to find; EM must terminate
    // with in-range parameters (the greatest(...,1) guards)
    val one = Linkage.emFit(Seq((Seq(1, 1, 1), 1000L)), iters = 10)
    (one.lambda +: (one.m ++ one.u)).foreach(v =>
      assert(v >= 0L && v <= Ppm))
    // zero-count patterns alongside a real one
    val sparse = Linkage.emFit(
      Seq((Seq(0, 0, 0), 0L), (Seq(1, 0, 1), 500L)), iters = 10)
    (sparse.lambda +: (sparse.m ++ sparse.u)).foreach(v =>
      assert(v >= 0L && v <= Ppm))
  }

  test("fsPatternSink: folded pattern state equals one aggregation " +
      "over all pair batches; replay is a no-op; fit matches full fit") {
    import graft.streaming.EventStream
    val dir = java.nio.file.Files
      .createTempDirectory("graft_fs_sink").toString
    val pairs = plant(2000L, 0.2, Seq(0.9, 0.8, 0.7), Seq(0.1, 0.2, 0.3))
      .flatMap { case (g, n) => Seq.fill(n.toInt)((g(0), g(1), g(2))) }
      .zipWithIndex.map { case ((a, b, c), i) => (a, b, c, i % 3) }
      .toDF("g1", "g2", "g3", "sp")
      .localCheckpoint()
    val cols = Seq("g1", "g2", "g3")
    (0 until 3).foreach { b =>
      EventStream.fsPatternSink(dir, cols)(
        pairs.filter(col("sp") === b), b.toLong)
    }
    val folded = EventStream.readFsPatterns(spark, dir, 3)
      .sortBy(_._1.mkString)
    val direct = Linkage.patternCounts(pairs, cols).collect()
      .map(r => (cols.map(c => r.getAs[Number](c).intValue),
        r.getAs[Long]("n")))
      .toSeq.sortBy(_._1.mkString)
    assert(folded == direct)
    // replayed batch id must not double-count
    EventStream.fsPatternSink(dir, cols)(
      pairs.filter(col("sp") === 2), 2L)
    assert(EventStream.readFsPatterns(spark, dir, 3)
      .sortBy(_._1.mkString) == direct)
    // and the refit from state equals the full fit exactly
    assert(Linkage.emFit(folded, iters = 10) ==
      Linkage.emFit(direct, iters = 10))
  }
}
