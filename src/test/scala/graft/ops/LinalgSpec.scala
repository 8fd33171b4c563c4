package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LinalgSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  test("gramMatrix equals the brute-force n·Sxx − SiSj on tiny data") {
    val rows = Seq(
      (1L, Array(1.0, 2.0)),
      (2L, Array(3.0, 5.0)),
      (3L, Array(-2.0, 0.5)))
    val got = Linalg.gramMatrix(rows.toDF("id", "v"), "v", 2)
      .as[(Long, Long, String)].collect()
      .map { case (i, j, m) => (i, j) -> BigInt(m) }.toMap
    val lv = rows.map(_._2.map(x => BigInt(math.round(x * 1e9))))
    val n = BigInt(rows.size)
    def sxx(i: Int, j: Int) = lv.map(v => v(i) * v(j)).sum
    def s(i: Int) = lv.map(_(i)).sum
    for (i <- 0 to 1; j <- 0 to 1)
      assert(got((i.toLong, j.toLong)) == n * sxx(i, j) - s(i) * s(j),
        s"cell ($i,$j)")
  }

  test("principal axis recovers a planted dominant direction") {
    // variance overwhelmingly along (3,4)/5 in 8 dims: points t·u + ε
    val rnd = new scala.util.Random(23)
    val u = Array(0.6, 0.8, 0, 0, 0, 0, 0, 0)
    val rows = (1L to 200L).map { i =>
      val t = rnd.nextGaussian() * 10
      (i, Array.tabulate(8)(d => t * u(d) + rnd.nextGaussian() * 0.1))
    }
    val axis = Linalg.principalAxis(
      Linalg.gramMatrix(rows.toDF("id", "v"), "v", 8), 8, iters = 20)
    val a = axis.map(_.toDouble)
    val norm = math.sqrt(a.map(x => x * x).sum)
    val cos = math.abs(a.zip(u).map { case (x, y) => x * y }.sum) / norm
    assert(cos > 0.999, s"axis misaligned with planted direction: $cos")
    // canonical orientation: first nonzero component positive
    assert(axis.find(_ != 0).forall(_ > 0))
  }

  test("pca projection is partition-independent and separates clusters") {
    val rnd = new scala.util.Random(29)
    def pt(c: Double) =
      Array.tabulate(8)(d => (if (d < 4) c else 0.0) + rnd.nextGaussian())
    val rows = (1L to 50L).map(i => (i, pt(8.0))) ++
      (51L to 100L).map(i => (i, pt(-8.0)))
    val df = rows.toDF("id", "v")
    val a = Linalg.pca(df, "id", "v", 8).as[(Long, Long)].collect().toMap
    val b = Linalg.pca(df.repartition(9), "id", "v", 8)
      .as[(Long, Long)].collect().toMap
    assert(a == b, "pca must be bit-identical under repartitioning")
    // the principal axis is the between-cluster direction: the two
    // clusters land on opposite sides with a wide margin
    val s1 = (1L to 50L).map(a)
    val s2 = (51L to 100L).map(a)
    assert(s1.max < s2.min || s2.max < s1.min,
      "projected clusters overlap on the principal axis")
  }

  test("zero-variance input fails loudly, not with a garbage axis") {
    val flat = (1L to 5L).map(i => (i, Array(1.0, 1.0))).toDF("id", "v")
    val ex = intercept[IllegalArgumentException] {
      Linalg.principalAxis(Linalg.gramMatrix(flat, "v", 2), 2)
    }
    assert(ex.getMessage.contains("zero vector"))
  }
}
