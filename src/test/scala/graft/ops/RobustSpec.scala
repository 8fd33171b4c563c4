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
}
