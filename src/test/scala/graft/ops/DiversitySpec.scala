package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DiversitySpec extends AnyFunSuite with WithSpark {

  private def vecs(rows: (Long, Seq[Double])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  // query 0 looks along +x; 1 is the top pick, 2 its near-twin
  // (dot(2,1) = 0.888 exceeds rel(2) = 0.88, so the λ=1/2 margin goes
  // negative), 3 is less relevant but diverse (dot(3,1) = 0.6 leaves a
  // +0.1 margin), 4 weak
  private def planted = vecs(
    0L -> Seq(1.0, 0.0, 0.0),
    1L -> Seq(0.9, 0.3, 0.0),
    2L -> Seq(0.88, 0.32, 0.0),
    3L -> Seq(0.7, -0.1, 0.0),
    4L -> Seq(0.2, 0.0, 0.1))

  test("lambda = 1 reduces to pure relevance top-k") {
    val e = planted
    val got = Diversity.mmrSelect(e, e.filter(col("vec_id") === 0),
        "vec_id", "embedding", shortlist = 4, k = 3,
        lambdaNum = 1L, lambdaDen = 1L)
      .orderBy("rank").select("neighbor_id")
      .collect().map(_.getLong(0)).toSeq
    // pure relevance order: 0.9 > 0.88 > 0.7
    assert(got == Seq(1L, 2L, 3L))
  }

  test("diversity penalty demotes the near-duplicate") {
    val e = planted
    val got = Diversity.mmrSelect(e, e.filter(col("vec_id") === 0),
        "vec_id", "embedding", shortlist = 4, k = 2,
        lambdaNum = 5L, lambdaDen = 10L)
      .orderBy("rank").select("neighbor_id")
      .collect().map(_.getLong(0)).toSeq
    // rank 1 = highest relevance (1); rank 2 must skip its near-twin 2
    // (sim(1,2) huge) in favor of the orthogonal 3
    assert(got == Seq(1L, 3L))
  }

  test("result is partition-layout independent and deterministic") {
    import spark.implicits._
    val base = (0L until 200L).map { i =>
      i -> Seq.tabulate(8)(j => math.sin(i * 13.7 + j * 0.91))
    }
    val a = Diversity.mmrSelect(
      base.toDF("vec_id", "embedding").repartition(1),
      base.take(3).toDF("vec_id", "embedding"),
      "vec_id", "embedding", shortlist = 10, k = 4)
    val b = Diversity.mmrSelect(
      base.toDF("vec_id", "embedding").repartition(32),
      base.take(3).toDF("vec_id", "embedding").repartition(2),
      "vec_id", "embedding", shortlist = 10, k = 4)
    assert(a.orderBy("query_id", "rank").collect().toSeq ==
      b.orderBy("query_id", "rank").collect().toSeq)
    assert(a.count() == 12)
  }

  test("mmrRescore over the brute-force shortlist reproduces " +
      "mmrSelect exactly (shared greedy)") {
    import spark.implicits._
    val base = (0L until 100L).map { i =>
      i -> Seq.tabulate(6)(j => math.cos(i * 7.3 + j * 1.17))
    }
    val e = base.toDF("vec_id", "embedding")
    val q = base.take(2).toDF("vec_id", "embedding")
    val direct = Diversity.mmrSelect(e, q, "vec_id", "embedding",
      shortlist = 12, k = 4)
    val pairs = graft.plans.TopKPerGroup.topK(
      e.select(col("vec_id").as("neighbor_id"),
          Diversity.snapMicro(col("embedding")).as("__cv"))
        .join(broadcast(q.select(col("vec_id").as("query_id"),
          Diversity.snapMicro(col("embedding")).as("__qv"))),
          col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          graft.plans.DotProduct.dot(col("__qv"), col("__cv"))
            .as("rel_d")),
      Seq("query_id"), "rel_d", "neighbor_id", 12)
    val rescored = Diversity.mmrRescore(
      pairs.select("query_id", "neighbor_id"), e, q,
      "vec_id", "embedding", k = 4)
    assert(direct.orderBy("query_id", "rank").collect().toSeq ==
      rescored.orderBy("query_id", "rank").collect().toSeq)
  }

  test("fewer candidates than k returns all candidates ranked") {
    val e = vecs(0L -> Seq(1.0, 0.0), 1L -> Seq(0.5, 0.5))
    val got = Diversity.mmrSelect(e, e.filter(col("vec_id") === 0),
      "vec_id", "embedding", shortlist = 8, k = 8)
    assert(got.count() == 1) // only one non-self candidate
  }

  test("kCenterGreedy: farthest-first picks the known sequence, the " +
      "radius curve is non-increasing past round 2, ties go to the " +
      "smaller id, layout-independent") {
    import spark.implicits._
    // 1-D line: 0 at x=0, 1 at x=0.1 (near 0), 2 at x=1.0, 3 at x=0.5
    // start = min id 0; round 2 -> farthest is 2 (d²=1.0);
    // round 3 -> 3 (min-dist 0.25); round 4 -> 1 (0.01)
    val e = vecs(0L -> Seq(0.0, 0.0), 1L -> Seq(0.1, 0.0),
      2L -> Seq(1.0, 0.0), 3L -> Seq(0.5, 0.0))
    val got = Diversity.kCenterGreedy(e, "vec_id", "embedding", k = 4)
      .as[(Int, Long, Long)].collect().toSeq.sortBy(_._1)
    val G = 1000000L
    assert(got == Seq((1, 0L, 0L), (2, 2L, G * G),
      (3, 3L, G / 2 * (G / 2)), (4, 1L, G / 10 * (G / 10))))
    // radii non-increasing from round 2 on (greedy coverage property)
    val radii = got.drop(1).map(_._3)
    assert(radii == radii.sorted.reverse)
    // equidistant tie: 0 at origin, 1 and 2 both at distance 1 on
    // opposite axes — round 2 must take id 1
    val tie = vecs(0L -> Seq(0.0, 0.0), 1L -> Seq(1.0, 0.0),
      2L -> Seq(0.0, 1.0))
    val t = Diversity.kCenterGreedy(tie, "vec_id", "embedding", k = 2)
      .as[(Int, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(t(1)._2 == 1L, s"tie must pick the smaller id: $t")
    // layout independence
    val a = Diversity.kCenterGreedy(
        e.repartition(7), "vec_id", "embedding", k = 4)
      .as[(Int, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(a == got)
  }
}
