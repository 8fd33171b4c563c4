package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Both-paths differentials for the fixed-round graph family's driver
  * kernels (the [[Graph.connectedComponents]] small-graph license,
  * extended in the optimization round): for every op with a
  * `smallGraphEdges` gate, the kernel (gate wide open) must equal the
  * distributed loop (gate = 0) row-for-row on random graphs with hubs,
  * chains, isolated seeds, and ties. The DuckDB oracle faces already
  * pin the kernel path against a third engine at the correctness SFs;
  * this spec pins kernel ≡ distributed so the gate constant can never
  * change a result, only a plan.
  */
class GraphKernelSpec extends AnyFunSuite {
  private lazy val spark = WithSpark.session
  import spark.implicits._

  private def randomEdges(seed: Long, n: Int, m: Int) = {
    val rnd = new scala.util.Random(seed)
    // a couple of hubs plus random pairs; self-loops included on
    // purpose (the ops must drop them)
    val hub = (1 to n / 3).map(i => (1L, (i + 1).toLong))
    val rest = (1 to m).map(_ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    (hub ++ rest).toDF("a", "b")
  }

  private def assertSame(
      a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame, label: String): Unit = {
    val x = a.collect().map(_.toSeq).toSet
    val y = b.collect().map(_.toSeq).toSet
    assert(x == y, s"$label kernel != distributed: " +
      s"only-kernel=${(x -- y).take(5)} only-dist=${(y -- x).take(5)}")
  }

  test("pageRankInt kernel equals the distributed loop") {
    for (seed <- Seq(1L, 2L)) {
      val e = randomEdges(seed, 40, 80)
      assertSame(
        Graph.pageRankInt(e, iters = 4),
        Graph.pageRankInt(e, iters = 4, smallGraphEdges = 0L),
        s"pageRankInt(seed=$seed)")
    }
  }

  test("personalizedPageRankInt kernel equals the distributed loop") {
    val e = randomEdges(3L, 40, 80)
    val seeds = Seq(1L, 5L, 9999L).toDF("node") // 9999 not a vertex
    assertSame(
      Graph.personalizedPageRankInt(e, seeds, iters = 4),
      Graph.personalizedPageRankInt(e, seeds, iters = 4,
        smallGraphEdges = 0L),
      "personalizedPageRankInt")
  }

  test("pageRankIntDirected kernel equals the distributed loop " +
    "(dangling mass included)") {
    for (seed <- Seq(4L, 5L)) {
      val e = randomEdges(seed, 40, 80) // directed as-is: sinks exist
      assertSame(
        Graph.pageRankIntDirected(e, iters = 4),
        Graph.pageRankIntDirected(e, iters = 4, smallGraphEdges = 0L),
        s"pageRankIntDirected(seed=$seed)")
    }
  }

  test("hitsInt kernel equals the distributed loop") {
    for (seed <- Seq(6L, 7L)) {
      val e = randomEdges(seed, 30, 60)
      assertSame(
        Graph.hitsInt(e, iters = 3),
        Graph.hitsInt(e, iters = 3, smallGraphEdges = 0L),
        s"hitsInt(seed=$seed)")
    }
  }

  test("ssspInt kernel equals the distributed loop (isolated seed kept)") {
    val rnd = new scala.util.Random(8L)
    val e = (1 to 80).map(_ => (rnd.nextInt(40).toLong,
      rnd.nextInt(40).toLong, (rnd.nextInt(9) + 1).toLong))
      .toDF("a", "b", "w")
    val seeds = Seq(0L, 7L, 555L).toDF("node") // 555 isolated
    assertSame(
      Graph.ssspInt(e, seeds, rounds = 5),
      Graph.ssspInt(e, seeds, rounds = 5, smallGraphEdges = 0L),
      "ssspInt")
  }

  test("bfsDistances kernel equals the distributed loop (chain + hops cap)") {
    val chain = (1L to 20L).map(i => (i, i + 1)).toDF("a", "b")
    val seeds = Seq(1L, 999L).toDF("node")
    for (hops <- Seq(0, 3, 25)) {
      assertSame(
        Graph.bfsDistances(chain, seeds, maxHops = hops),
        Graph.bfsDistances(chain, seeds, maxHops = hops,
          smallGraphEdges = 0L),
        s"bfsDistances(hops=$hops)")
    }
  }

  test("kCore kernel equals the distributed loop") {
    for (seed <- Seq(9L, 10L); k <- Seq(2, 3)) {
      val e = randomEdges(seed, 30, 90)
      assertSame(
        Graph.kCore(e, k = k, rounds = 6),
        Graph.kCore(e, k = k, rounds = 6, smallGraphEdges = 0L),
        s"kCore(seed=$seed,k=$k)")
    }
  }

  test("labelPropagation kernel equals the distributed loop (tie rule)") {
    for (seed <- Seq(11L, 12L)) {
      val e = randomEdges(seed, 30, 60)
      assertSame(
        Graph.labelPropagation(e, iters = 3),
        Graph.labelPropagation(e, iters = 3, smallGraphEdges = 0L),
        s"labelPropagation(seed=$seed)")
    }
  }
}
