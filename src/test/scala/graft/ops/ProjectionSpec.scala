package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProjectionSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  test("sign matrix is ±1, deterministic, and salt-sensitive") {
    val s1 = Projection.signMatrix(64, 16, "jl")
    val s2 = Projection.signMatrix(64, 16, "jl")
    val s3 = Projection.signMatrix(64, 16, "other")
    assert(s1 == s2)
    assert(s1 != s3)
    assert(s1.flatten.forall(v => v == 1 || v == -1))
    // roughly balanced: a degenerate all-one matrix would be a bug in
    // the digest wiring, not bad luck (p ~ 2^-1024)
    val ones = s1.flatten.count(_ == 1)
    assert(ones > 400 && ones < 624, s"suspicious sign balance: $ones")
  }

  test("projection is an exact integer: partition-independent and " +
    "linear in the input") {
    val rnd = new scala.util.Random(5)
    val rows = (1L to 100L).map(i =>
      (i, Array.fill(16)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("id", "v")
    val a = Projection.randomProject(df, "id", "v", 16, 4)
      .as[(Long, Long, Long)].collect().toSet
    val b = Projection.randomProject(df.repartition(11), "id", "v", 16, 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
    // scaling the input by 3 scales the snapped projection by exactly 3
    // only up to grid snap; verify against a direct Scala recomputation
    val signs = Projection.signMatrix(16, 4, "jl")
    val expect = rows.flatMap { case (id, v) =>
      signs.zipWithIndex.map { case (row, j) =>
        (id, j.toLong, row.zip(v).map { case (s, x) =>
          math.round(x * 1000000000L) * s
        }.sum)
      }
    }.toSet
    assert(a == expect)
  }

  test("JL property: planted cluster separation survives projection") {
    // iid Gaussian pairwise distances concentrate (all ≈ equal in high
    // dimension), so distance CORRELATION is vacuous — the property a
    // pipeline relies on is separation: far-apart clusters stay far
    // apart after projection. Two clusters ±10 apart in 32 of 64
    // coordinates, unit noise elsewhere.
    val rnd = new scala.util.Random(17)
    def point(center: Double) =
      Array.tabulate(64)(d =>
        (if (d < 32) center else 0.0) + rnd.nextGaussian())
    val rows = (1L to 30L).map(i => (i, point(10.0))) ++
      (31L to 60L).map(i => (i, point(-10.0)))
    val proj = Projection.randomProject(rows.toDF("id", "v"), "id", "v", 64, 16)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1)
      .map { case (id, rs) =>
        id -> rs.sortBy(_._2).map(_._3.toDouble / 1e9).toArray
      }
    def d(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val within = for (i <- 1L to 30L; j <- (i + 1) to 30L)
      yield d(proj(i), proj(j))
    val between = for (i <- 1L to 30L; j <- 31L to 60L)
      yield d(proj(i), proj(j))
    assert(within.max < between.min,
      s"cluster separation lost: max within ${within.max} vs " +
        s"min between ${between.min}")
  }

  test("quantizeInt8: codes bounded, dequant error bounded, " +
    "zero vector safe, partition-independent") {
    val rnd = new scala.util.Random(5)
    val rows = (1L to 40L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat))) :+
      (41L, Array.fill(16)(0.0f))
    val df = rows.toDF("id", "v")
    val got = Projection.quantizeInt8(df, "id", "v")
      .as[(Long, Long, Array[Int])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.size == 41)
    // |q| <= 127 by construction; the max-|component| slot hits ±127
    got.foreach { case (id, (m, q)) =>
      assert(q.forall(c => c.abs <= 127), s"code out of range for $id")
      assert(m >= 1L)
    }
    assert(got(41L)._2.forall(_ == 0), "zero vector must quantize to zeros")
    got.filterNot(_._1 == 41L).foreach { case (id, (m, q)) =>
      assert(q.map(_.abs).max == 127,
        s"the max component of $id must saturate the int8 range")
      // dequantization error: |x - q*m/127| <= m/127 (one code step)
      val orig = rows.find(_._1 == id).get._2
      q.zip(orig).foreach { case (c, x) =>
        val err = math.abs(x.toDouble - c.toDouble * m / (127.0 * 1e9))
        assert(err <= m / (127.0 * 1e9) + 1e-9, s"dequant err $err for $id")
      }
    }
    val again = Projection.quantizeInt8(df.repartition(7), "id", "v")
      .as[(Long, Long, Array[Int])].collect()
      .map(r => r._1 -> (r._2, r._3.toSeq)).toMap
    assert(again == got.view.mapValues { case (m, q) => (m, q.toSeq) }.toMap)
  }
}
