package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DensitySpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  /** Brute-force reference: core/border/noise + min-core-id clusters
    * with the same deterministic min-attachment border rule. */
  private def reference(
      pts: Seq[(Long, Long, Long)], eps: Long, minPts: Int)
      : Map[Long, (Option[Long], String)] = {
    val eps2 = BigInt(eps) * BigInt(eps)
    def near(a: (Long, Long, Long), b: (Long, Long, Long)) = {
      val (dx, dy) = (BigInt(a._2 - b._2), BigInt(a._3 - b._3))
      dx * dx + dy * dy <= eps2
    }
    val nbrs = pts.map(p =>
      p._1 -> pts.filter(q => q._1 != p._1 && near(p, q)).map(_._1)).toMap
    val core = pts.map(_._1).filter(id => nbrs(id).size + 1 >= minPts).toSet
    // min-label propagation over core-core edges until fixpoint
    var label = core.map(id => id -> id).toMap
    var changed = true
    while (changed) {
      changed = false
      core.foreach { id =>
        val m = (nbrs(id).filter(core).map(label) :+ label(id)).min
        if (m < label(id)) { label += id -> m; changed = true }
      }
    }
    pts.map { p =>
      val id = p._1
      if (core(id)) id -> (Some(label(id)), "core")
      else {
        val coreNbrs = nbrs(id).filter(core)
        if (coreNbrs.nonEmpty) id -> (Some(coreNbrs.map(label).min), "border")
        else id -> (None, "noise")
      }
    }.toMap
  }

  private def run(pts: Seq[(Long, Long, Long)], eps: Long, minPts: Int) =
    Density.dbscan(pts.toDF("id", "x", "y"), "id", "x", "y", eps, minPts)
      .as[(Long, Option[Long], String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("random layouts equal brute-force DBSCAN (differential, 3 trials)") {
    val rnd = new scala.util.Random(41)
    (1 to 3).foreach { trial =>
      // mixed scale, negative coords, grid-boundary values included
      val pts = (1L to 120L).map(i =>
        (i, rnd.between(-50L, 50L) * 100L + rnd.between(-99L, 100L),
          rnd.between(-50L, 50L) * 100L + rnd.between(-99L, 100L)))
      val got = run(pts, eps = 300L, minPts = 4)
      val exp = reference(pts, eps = 300L, minPts = 4)
      assert(got == exp, s"trial $trial diverged")
    }
  }

  test("textbook shapes: two blobs, a bridge border point, far noise") {
    val blobA = (1L to 5L).map(i => (i, i, 0L))          // tight line at y=0
    val blobB = (11L to 15L).map(i => (i, 1000L + i, 0L))
    val bridge = Seq((20L, 9L, 0L))   // one in-range neighbor (5,0): not core
    val noise = Seq((30L, 500L, 500L))
    val got = run(blobA ++ blobB ++ bridge ++ noise, eps = 4L, minPts = 3)
    assert(got(1L) == (Some(1L), "core"))
    assert(got(12L) == (Some(11L), "core"))
    assert(got(20L) == (Some(1L), "border")) // near 5,4 — not core itself
    assert(got(30L) == (None, "noise"))
    // the two blobs never merge
    assert(got.filter(_._2._2 == "core").values.map(_._1).toSet ==
      Set(Some(1L), Some(11L)))
  }

  test("result is partition-independent") {
    val rnd = new scala.util.Random(43)
    val pts = (1L to 80L).map(i =>
      (i, rnd.between(-2000L, 2000L), rnd.between(-2000L, 2000L)))
    val df = pts.toDF("id", "x", "y")
    val a = Density.dbscan(df, "id", "x", "y", 500L, 4)
      .as[(Long, Option[Long], String)].collect().toSet
    val b = Density.dbscan(df.repartition(13), "id", "x", "y", 500L, 4)
      .as[(Long, Option[Long], String)].collect().toSet
    assert(a == b)
  }

  test("clusterEval: perfect partition scores purity 1 / ARI 1, the " +
      "one-cluster degenerate scores ARI 0, noise rows are excluded") {
    def eval(asg: Seq[(Long, Option[Long])], lab: Seq[(Long, Int)]) =
      Density.clusterEval(
          asg.toDF("id", "cluster"), "id", "cluster",
          lab.toDF("id", "label"), "label")
        .as[(Long, Long, Long, Long, Double, String, String,
          Option[Double])]
        .collect().head
    // perfect: clusters exactly reproduce the labels
    val perfect = eval(
      Seq(1L -> Some(10L), 2L -> Some(10L), 3L -> Some(20L), 4L -> Some(20L)),
      Seq(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1))
    assert(perfect._5 == 1.0, s"purity: $perfect")
    assert(perfect._6 == perfect._7 && perfect._8.contains(1.0), s"ARI: $perfect")
    // degenerate: everything in ONE cluster over two labels — index
    // equals its expectation, ARI = 0 exactly
    val one = eval(
      Seq(1L -> Some(10L), 2L -> Some(10L), 3L -> Some(10L), 4L -> Some(10L)),
      Seq(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1))
    assert(one._6 == "0" && one._8.contains(0.0), s"degenerate ARI: $one")
    // noise (null cluster) drops out of the evaluation
    val noisy = eval(
      Seq(1L -> Some(10L), 2L -> Some(10L), 3L -> None),
      Seq(1L -> 0, 2L -> 0, 3L -> 1))
    assert(noisy._1 == 2L && noisy._5 == 1.0, s"noise handling: $noisy")
    // and the both-trivial degenerate (one cluster, one label after
    // noise removal) yields NULL ARI, not a crash or an invented score
    assert(noisy._8.isEmpty, s"trivial-partition ARI must be NULL: $noisy")
  }
}
