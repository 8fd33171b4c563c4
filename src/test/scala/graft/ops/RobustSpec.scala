package graft.ops

import graft.WithSpark
import org.scalatest.funsuite.AnyFunSuite

class RobustSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  test("flags the corrupt row, not its neighbors, even when the " +
    "outlier is extreme enough to wreck mean/stddev") {
    // tight group around 100 plus a 10^9 corruption: σ-based gates
    // inflate σ by the outlier itself; MAD's median arithmetic ignores
    // it completely
    val rows = ((1L to 20L).map(i => (i, "g", 100L + (i % 5))) :+
      (99L, "g", 1000000000L)).toDF("id", "grp", "v")
    val got = Robust.madOutliers(rows, "grp", "v", k = 5)
      .select("id").as[Long].collect().toSet
    assert(got == Set(99L))
  }

  test("hand-computed gate: k*MAD boundary is exclusive") {
    // v = 1,2,3,4,100: median 3, deviations 2,1,0,1,97, MAD = 1
    // k=5 -> flag |v-3| > 5: only 100
    val rows = Seq(1L, 2L, 3L, 4L, 100L).zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }.toDF("id", "grp", "v")
    val got = Robust.madOutliers(rows, "grp", "v", k = 5)
      .select("v").as[Long].collect().toSeq
    assert(got == Seq(100L))
  }

  test("groups are independent; result is partition-independent") {
    val rnd = new scala.util.Random(17)
    val rows = (1L to 300L).map { i =>
      val g = s"g${i % 3}"
      val v = if (i % 97 == 0) 100000L else 500L + rnd.nextInt(20)
      (i, g, v)
    }.toDF("id", "grp", "v")
    val a = Robust.madOutliers(rows, "grp", "v", k = 5)
      .select("id").as[Long].collect().toSet
    val b = Robust.madOutliers(rows.repartition(11), "grp", "v", k = 5)
      .select("id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
    assert(a.forall(_ % 97 == 0), "only planted corruptions may flag")
  }

  test("theilSen recovers an exact linear slope in ppm") {
    // y = 7x + 3 → every pairwise slope is exactly 7·10^6
    val pts = (0L to 29L).map(x => ("g", x, 7 * x + 3)).toDF("g", "x", "y")
    val got = Robust.theilSen(pts, "g", "x", "y").collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 435L) // C(30,2) pairs
    assert(got(0).getLong(2) == 7000000L)
  }

  test("theilSen shrugs off a corrupt day that drags the OLS fit") {
    // clean slope 5; one day's y is 10^6× off
    val pts = (0L to 29L).map { x =>
      ("g", x, if (x == 13L) 5000000000L else 5 * x)
    }.toDF("g", "x", "y")
    val slope = Robust.theilSen(pts, "g", "x", "y")
      .collect()(0).getLong(2)
    // the median slope stays on the clean trend (5·10^6 ± one grid
    // step from truncation); an OLS fit lands in the millions
    assert(math.abs(slope - 5000000L) <= 1L, s"slope_ppm=$slope")
  }

  test("theilSen: lower-median rank and negative-slope truncation " +
      "match the documented contract") {
    // two groups; one descending series exercises negative div
    val pts = (Seq(("up", 0L, 0L), ("up", 1L, 1L), ("up", 2L, 4L)) ++
      Seq(("down", 0L, 9L), ("down", 1L, 5L), ("down", 2L, 0L)))
      .toDF("g", "x", "y")
    val got = Robust.theilSen(pts, "g", "x", "y")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // up slopes: 1, 3, 2 → sorted 1,2,3 → lower median (rank 2) = 2
    assert(got("up") == ((3L, 2000000L)))
    // down slopes: -4, -5, -4.5→trunc -4500000 → sorted
    // -5000000, -4500000, -4000000 → median -4500000
    assert(got("down") == ((3L, -4500000L)))
  }

  test("theilSen truncates toward zero on non-divisible negative " +
      "slopes (floor division would differ)") {
    // single pair, x-gap 3, y-diff -7: -7·10^6/3 = -2333333.33… →
    // trunc (Spark div, DuckDB //) gives -2333333; floor semantics
    // would give -2333334 — this pins the truncation contract the
    // exactly-divisible cases above cannot distinguish
    val pts = Seq(("g", 0L, 7L), ("g", 3L, 0L)).toDF("g", "x", "y")
    val got = Robust.theilSen(pts, "g", "x", "y").collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 1L)
    assert(got(0).getLong(2) == -2333333L)
  }

  test("theilSen fails loudly when a group exceeds maxPoints") {
    val pts = (0L to 40L).map(x => ("g", x, x)).toDF("g", "x", "y")
    val ex = intercept[Throwable] {
      Robust.theilSen(pts, "g", "x", "y", maxPoints = 40).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("maxPoints")),
      s"expected the loud maxPoints message, got: ${msgs(ex)}")
    // at the cap it still runs
    val ok = Robust.theilSen(pts, "g", "x", "y", maxPoints = 41)
      .collect()
    assert(ok(0).getLong(2) == 1000000L)
  }
}
