package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)],
      nodes: Option[Seq[Long]] = None,
      smallGraphEdges: Long = 500000L): Map[Long, Long] =
    Graph.connectedComponents(
        edges.toDF("a", "b"),
        nodes.map(_.toDF("id")),
        smallGraphEdges = smallGraphEdges)
      .as[(Long, Long)].collect().toMap

  test("chain graph collapses to one component (the label-prop worst case)") {
    // a path 0-1-2-...-63: diameter 63, the shape where min-label
    // propagation needs one round per hop; large-star/small-star must
    // still converge inside its default iteration budget — force the
    // DISTRIBUTED loop (smallGraphEdges = 0), since convergence is the
    // property under test
    val chain = (0L until 63L).map(i => (i, i + 1))
    val got = cc(chain, smallGraphEdges = 0L)
    assert(got.size == 64 && got.values.toSet == Set(0L))
  }

  test("gate boundary: a path graph of 500,001 oriented edges takes the " +
    "distributed loop and converges; 499,999 takes the kernel — labels agree") {
    // adversarial shape (maximum diameter) sitting one edge either side
    // of the smallGraphEdges gate. Guards the gate constant against
    // silent drift: the big path MUST clear the distributed loop's
    // convergence contract (require(converged) fails the test loudly if
    // the O(log² n) budget ever stops covering a 500k-node diameter),
    // and the just-under path exercises the primitive-array kernel at
    // its capacity bound. Both are a single component rooted at 0.
    def path(nodes: Long) = spark.range(nodes - 1)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val big = Graph.connectedComponents(path(500002L)) // 500,001 edges
    assert(big.count() == 500002L)
    assert(big.filter(col("component") =!= 0L).count() == 0L,
      "distributed loop must collapse the over-gate path to component 0")
    val small = Graph.connectedComponents(path(500000L)) // 499,999 edges
    assert(small.count() == 500000L)
    assert(small.filter(col("component") =!= 0L).count() == 0L,
      "kernel must collapse the under-gate path to component 0")
  }

  test("driver union-find kernel equals the distributed star loop") {
    val rnd = new scala.util.Random(31)
    (1 to 3).foreach { trial =>
      val n = 80
      val edges = (1 to 70).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val universe = Some(0L until n.toLong)
      val viaDriver = cc(edges, universe.map(_.toSeq))
      val viaStars = cc(edges, universe.map(_.toSeq), smallGraphEdges = 0L)
      assert(viaDriver == viaStars, s"trial $trial: paths diverged")
    }
  }

  test("cliques, isolated universe nodes, self-loops, reversed edges") {
    val edges = Seq(
      (10L, 11L), (11L, 12L), (12L, 10L), // clique A -> min 10
      (5L, 3L),                           // reversed pair   -> min 3
      (7L, 7L))                           // self-loop: no edge
    val got = cc(edges, nodes = Some(Seq(3L, 5L, 7L, 10L, 11L, 12L, 99L)))
    assert(got == Map(3L -> 3L, 5L -> 3L, 7L -> 7L, 10L -> 10L,
      11L -> 10L, 12L -> 10L, 99L -> 99L))
  }

  test("empty edge set labels every universe node a singleton") {
    val got = cc(Seq.empty, nodes = Some(Seq(1L, 2L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("random graphs agree with Dedup.clusterLabels (differential)") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { trial =>
      val n = 60
      val edges = (1 to 50).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val universe = (0L until n.toLong)
      val viaStars = cc(edges, Some(universe), smallGraphEdges = 0L)
      val viaLabels = Dedup.clusterLabels(
          universe.toDF("id"), edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      assert(viaStars == viaLabels, s"trial $trial diverged")
    }
  }

  test("pageRankInt is deterministic under repartitioning and " +
    "distributes mass by connectivity") {
    // star: hub 0 + leaves 1..8, plus a detached 2-cycle (9,10)
    val edges = ((1L to 8L).map(l => (0L, l)) ++ Seq((9L, 10L))).toDF("a", "b")
    val r1 = Graph.pageRankInt(edges, iters = 5)
      .as[(Long, Long)].collect().toMap
    val r2 = Graph.pageRankInt(edges.repartition(7), iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(r1 == r2, "integer PageRank must be partition-independent")
    // the hub out-ranks every leaf; the 2-cycle nodes tie exactly
    assert((1L to 8L).forall(l => r1(0L) > r1(l)))
    assert(r1(9L) == r1(10L))
    // leaves are symmetric: all equal
    assert((1L to 8L).map(r1).toSet.size == 1)
  }

  test("pageRankIntDirected is deterministic under repartitioning and " +
    "ranks an in-link sink above its feeders") {
    // feeders 1..8 each point at 0; 0 has no out-edge (pure sink), so
    // every round its inflow returns to the pool as dangling mass
    val edges = (1L to 8L).map(l => (l, 0L)).toDF("a", "b")
    val r1 = Graph.pageRankIntDirected(edges, iters = 5)
      .as[(Long, Long)].collect().toMap
    val r2 = Graph.pageRankIntDirected(edges.repartition(7), iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(r1 == r2, "directed integer PageRank must be partition-independent")
    assert(r1.size == 9)
    assert((1L to 8L).forall(l => r1(0L) > r1(l)), "sink must out-rank feeders")
    // feeders are symmetric: identical ranks
    assert((1L to 8L).map(r1).toSet.size == 1)
  }

  test("pageRankIntDirected conserves mass including a sink-only vertex") {
    // cycle 0→1→2→0 plus 2→3 with 3 a dangling sink: without the
    // D div N redistribution the total would drain toward the teleport
    // floor; with it the mass stays within truncation loss of Scale
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L)).toDF("a", "b")
    val total = Graph.pageRankIntDirected(edges, iters = 5)
      .agg(sum("rank_u")).as[Long].first()
    assert(total <= Graph.Scale)
    assert(total > Graph.Scale - 1000L, s"mass leaked too far: $total")
  }

  test("pageRankIntDirected deep unroll (20 rounds) plans and conserves") {
    // the plan-text cap (periodic truncating checkpoint over the
    // twice-consumed rank frame) is what makes deep unrolls plannable
    // at all — this pins that a 20-round run neither OOMs the analyzer
    // nor leaks mass
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L)).toDF("a", "b")
    val total = Graph.pageRankIntDirected(edges, iters = 20)
      .agg(sum("rank_u")).as[Long].first()
    assert(total <= Graph.Scale)
    assert(total > Graph.Scale - 5000L, s"mass leaked too far: $total")
  }

  test("pageRankIntDirected on a symmetric edge set equals pageRankInt") {
    // feeding both orientations of each undirected edge: no vertex is
    // dangling, outdeg = degree, so the directed recurrence reduces
    // exactly to the undirected one — bit-for-bit
    val und = ((1L to 5L).map(l => (0L, l)) ++ Seq((6L, 7L), (5L, 6L)))
    val dir = (und ++ und.map(_.swap)).toDF("a", "b")
    val viaDirected = Graph.pageRankIntDirected(dir, iters = 4)
      .as[(Long, Long)].collect().toMap
    val viaUndirected = Graph.pageRankInt(und.toDF("a", "b"), iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(viaDirected == viaUndirected)
  }

  test("pageRankInt mass stays within truncation loss of the scale") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L)).toDF("a", "b")
    val total = Graph.pageRankInt(edges, iters = 5)
      .agg(sum("rank_u")).as[Long].first()
    // each truncating div sheds < 1 micro-unit; with E edges and k
    // rounds the loss is < (E*2 + 2) * k + N micro-units — assert the
    // conserved-mass property that makes ranks comparable across runs
    assert(total <= Graph.Scale)
    assert(total > Graph.Scale - 1000L, s"mass leaked too far: $total")
  }

  test("triangleCount: textbook shapes") {
    import spark.implicits._
    def count(es: Seq[(Long, Long)]): Long =
      Graph.triangleCount(es.toDF("a", "b")).as[Long].first()
    // K4 has C(4,3) = 4 triangles
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    assert(count(k4) == 4L)
    // a path has none; a single triangle has one; self-loops,
    // duplicates, and reversed duplicates don't inflate the count
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == 0L)
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (1L, 1L), (2L, 1L), (1L, 2L))) == 1L)
    assert(count(Seq.empty) == 0L)
  }

  test("triangleCount matches brute force on a pseudo-random graph " +
      "with a hub (degree-order invariance)") {
    import spark.implicits._
    // hub node 0 touches everyone; plus deterministic sparse edges
    val n = 40L
    val edges = ((1L until n).map(i => (0L, i)) ++
      (for (i <- 1L until n; j <- (i + 1) until n
            if (i * 31 + j * 17) % 11 == 0) yield (i, j))).toSeq
    val got = Graph.triangleCount(edges.toDF("a", "b")).as[Long].first()
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toSet
    val brute = (for {
      a <- 0L until n; b <- (a + 1) until n; c <- (b + 1) until n
      if es((a, b)) && es((b, c)) && es((a, c))
    } yield 1).size
    assert(got == brute.toLong, s"got $got, brute $brute")
  }

  test("kCore: peeling cascades (pendant chains fall even when their " +
      "anchor starts at degree >= k), the clique survives, and the " +
      "face's round budget converges on its graph") {
    // K4 {0..3} with a pendant chain 3-4-5: after dropping 5 (deg 1),
    // 4 drops, then 3 still has 3 clique neighbors — 3-core = K4.
    // One round is NOT enough (4 starts at degree 2, 3 at degree 4) —
    // the cascade is the property under test
    val k4 = for { i <- 0 until 4; j <- (i + 1) until 4 }
      yield (i.toLong, j.toLong)
    val g = (k4 ++ Seq((3L, 4L), (4L, 5L))).toDF("a", "b")
    val core = Graph.kCore(g, k = 3, rounds = 5)
      .as[(Long, Long)].collect().toMap
    assert(core == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    // a pure chain has no 2-core at all
    val chain = (0L until 10L).map(i => (i, i + 1)).toDF("a", "b")
    assert(Graph.kCore(chain, k = 2, rounds = 10).count() == 0)
    // the q_kcore face's budget (8 rounds, k=3) is a converged
    // fixpoint on its co-purchase graph: one more round changes nothing
    val e = graft.queries.GraphQueries.edges(spark, "/root/testdata/sf0.001", 2)
    val r8 = Graph.kCore(e, 3, rounds = 8).as[(Long, Long)].collect().toSet
    val r9 = Graph.kCore(e, 3, rounds = 9).as[(Long, Long)].collect().toSet
    assert(r8 == r9, "q_kcore's 8-round budget has not converged")
  }

  test("incrementalComponents equals a full rebuild on random graphs, " +
      "merges prior components, and admits brand-new nodes") {
    val rnd = new scala.util.Random(47)
    (1 to 3).foreach { trial =>
      val n = 60
      val all = (1 to 80).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val (old, nw) = all.partition(e => (e._1 + e._2) % 3 != 0)
      val prior = Graph.connectedComponents(old.toDF("a", "b"))
      val inc = Graph.incrementalComponents(prior, nw.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      val full = cc(all)
      assert(inc == full, s"trial $trial: incremental != full rebuild")
    }
    // one new edge merges two prior components; a disjoint new pair
    // enters with its own min label
    val prior = Graph.connectedComponents(
      Seq((1L, 2L), (10L, 11L)).toDF("a", "b"))
    val inc = Graph.incrementalComponents(
        prior, Seq((2L, 10L), (100L, 101L)).toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(inc == Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L,
      100L -> 100L, 101L -> 100L))
  }

  test("personalizedPageRankInt: seeded mass stays near the seeds, " +
      "all-vertices seeding degenerates to plain pagerank, " +
      "deterministic under repartitioning") {
    // barbell: K4 {0..3} — path — K4 {10..13}; seed the left clique
    val edges = ((for { i <- 0 until 4; j <- (i + 1) until 4 }
      yield (i.toLong, j.toLong)) ++
      (for { i <- 0 until 4; j <- (i + 1) until 4 }
        yield (10L + i, 10L + j)) ++
      Seq((3L, 6L), (6L, 10L))).toDF("a", "b")
    val seeds = Seq(0L, 1L).toDF("node")
    val ppr = Graph.personalizedPageRankInt(edges, seeds, iters = 5)
      .as[(Long, Long)].collect().toMap
    // seeds hold the most rank; the far clique's interior holds least
    assert(ppr(0L) > ppr(3L) && ppr(3L) > ppr(11L),
      s"rank must decay with seed distance: $ppr")
    assert(ppr(0L) > 0 && ppr(11L) >= 0)
    // seeding EVERY vertex reproduces the uniform-teleport fixed point
    val verts = (0L to 3L) ++ Seq(6L) ++ (10L to 13L)
    val allSeeded = Graph.personalizedPageRankInt(
        edges, verts.toDF("node"), iters = 5)
      .as[(Long, Long)].collect().toMap
    val plain = Graph.pageRankInt(edges, iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(allSeeded == plain)
    // layout independence
    val ppr2 = Graph.personalizedPageRankInt(
        edges.repartition(11), seeds, iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(ppr == ppr2)
  }

  test("labelPropagation: two cliques joined by one bridge edge " +
      "separate into two communities; CC would merge them") {
    // K4 {0,1,2,3} — K4 {10,11,12,13}, bridged 3–10: within each
    // clique every vertex sees ≥2 votes for the clique minimum; the
    // bridge carries only 1 vote each way, so the mode never crosses
    def k4(base: Long): Seq[(Long, Long)] =
      (for { i <- 0 until 4; j <- (i + 1) until 4 }
        yield (base + i, base + j)).toSeq
    val edges = (k4(0) ++ k4(10) :+ (3L, 10L)).toDF("a", "b")
    val got = Graph.labelPropagation(edges, iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 8)
    assert((0L to 3L).map(got).toSet.size == 1, "left clique split")
    assert((10L to 13L).map(got).toSet.size == 1, "right clique split")
    assert(got(0L) != got(10L), "bridge merged the cliques")
    // reachability, by contrast, is ONE class
    assert(cc(k4(0) ++ k4(10) :+ (3L, 10L)).values.toSet.size == 1)
  }

  test("labelPropagation is deterministic under repartitioning, breaks " +
      "vote ties to the smaller label, and the self-vote prevents the " +
      "star/bipartite oscillation") {
    // star: center 5 with leaves 1,2,3. WITHOUT the self-vote sync LPA
    // oscillates forever (leaves↔center swap label sets each round);
    // with it, round 1 ties every vertex to the min label 1 and the
    // graph converges to one community
    val star = Seq((5L, 1L), (5L, 2L), (5L, 3L)).toDF("a", "b")
    val r1 = Graph.labelPropagation(star, iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L),
      s"star must converge to the min label, got $r1")
    val r2 = Graph.labelPropagation(star.repartition(13), iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(r1 == r2, "layout changed the converged labels")
  }

  private def bfs(edges: Seq[(Long, Long)], seeds: Seq[Long],
      maxHops: Int): Map[Long, Long] =
    Graph.bfsDistances(edges.toDF("a", "b"), seeds.toDF("id"), maxHops)
      .as[(Long, Long)].collect().toMap

  test("bfsDistances: chain distances from one end, early exit past it") {
    val chain = (0L until 5L).map(i => (i, i + 1))
    assert(bfs(chain, Seq(0L), maxHops = 10) ==
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
  }

  test("bfsDistances: maxHops truncates; unreached nodes absent") {
    val chain = (0L until 5L).map(i => (i, i + 1))
    assert(bfs(chain, Seq(0L), maxHops = 2) ==
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("bfsDistances: multi-source takes the minimum over seeds") {
    val chain = (0L until 6L).map(i => (i, i + 1))
    assert(bfs(chain, Seq(0L, 6L), maxHops = 3) ==
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L,
        6L -> 0L, 5L -> 1L, 4L -> 2L))
  }

  test("bfsDistances: isolated seed reports 0; edges are undirected") {
    val got = bfs(Seq((10L, 11L)), Seq(11L, 99L), maxHops = 2)
    assert(got == Map(11L -> 0L, 99L -> 0L, 10L -> 1L))
  }

  test("bfsDistances: maxHops 0 returns the seed set only") {
    assert(bfs(Seq((1L, 2L)), Seq(1L), maxHops = 0) == Map(1L -> 0L))
  }

  private def sssp(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
      rounds: Int): Map[Long, Long] =
    Graph.ssspInt(edges.toDF("a", "b", "w"), seeds.toDF("id"), rounds)
      .as[(Long, Long)].collect().toMap

  test("ssspInt: a cheap two-hop path beats the heavy direct edge") {
    val got = sssp(Seq((0L, 2L, 10L), (0L, 1L, 3L), (1L, 2L, 3L)),
      Seq(0L), rounds = 4)
    assert(got == Map(0L -> 0L, 1L -> 3L, 2L -> 6L))
  }

  test("ssspInt: the round budget bounds path length (documented)") {
    val chain = Seq((0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L))
    assert(sssp(chain, Seq(0L), rounds = 2) ==
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
    assert(sssp(chain, Seq(0L), rounds = 3)(3L) == 3L)
  }

  test("linkCandidates: scores non-edges only, exact integer scores") {
    // 4-cycle 1-2-3-4-1: both diagonals (1,3) and (2,4) share two
    // neighbors; all degrees 2, preferential attachment 4
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 4L), (3L, 4L))
      .toDF("a", "b")
    val got = Graph.linkCandidates(edges, minCommon = 2L).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 3L), (2L, 4L)))
    got.foreach { r =>
      assert(r.getLong(2) == 2L && r.getLong(3) == 2L &&
        r.getLong(4) == 2L && r.getLong(5) == 4L)
    }
  }

  test("linkCandidates: existing edges are excluded even with shared " +
      "neighbors") {
    // triangle + hub: (1,2) adjacent with common neighbor 3 — must
    // not appear; only the non-edge (2,4) via {1,3}... construct:
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (3L, 4L))
      .toDF("a", "b")
    val got = Graph.linkCandidates(edges, minCommon = 2L)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 4L)))
  }

  test("ssspInt: undirected relaxation and multi-seed minimum") {
    val got = sssp(Seq((5L, 4L, 2L), (4L, 3L, 2L)), Seq(3L, 5L),
      rounds = 4)
    assert(got == Map(3L -> 0L, 5L -> 0L, 4L -> 2L))
  }

  test("resourceAllocation: hubs weigh less than exclusive mutuals") {
    // (1,2) share low-degree 3 (deg 2) AND hub 4 (deg 4):
    // ra = 10^6/2 + 10^6/4; (5,6) share only the hub: ra = 10^6/4
    val edges = Seq((1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L),
      (5L, 4L), (6L, 4L)).toDF("a", "b")
    val got = Graph.resourceAllocation(edges, minCommon = 1L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(got((1L, 2L)) == ((2L, 750000L)))
    assert(got((5L, 6L))._2 == 250000L)
    // adjacent pairs never appear
    assert(!got.contains((1L, 3L)) && !got.contains((1L, 4L)))
  }

  test("clusteringCoefficient: triangle=10^6, path middle=0, " +
      "paw handled exactly") {
    // paw graph: triangle {1,2,3} + pendant 4 on 1.
    // lcc(2)=lcc(3)=10^6; lcc(1)=2·1·10^6/(3·2)=333333; lcc(4)=0
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val got = Graph.clusteringCoefficient(edges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(got(2L) == ((2L, 1L, 1000000L)))
    assert(got(3L) == ((2L, 1L, 1000000L)))
    assert(got(1L) == ((3L, 1L, 333333L)))
    assert(got(4L) == ((1L, 0L, 0L)))
  }

  test("hitsInt: pure sources get hub mass, pure sinks authority, " +
      "max-normalization pins the top at 10^6") {
    // 1→3, 2→3, 2→4: 3 is the strongest authority, 2 the strongest
    // hub (points at both sinks); 3,4 have no out-edge → hub 0;
    // 1,2 have no in-edge → authority 0.
    val edges = Seq((1L, 3L), (2L, 3L), (2L, 4L)).toDF("a", "b")
    val got = Graph.hitsInt(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got(2L)._1 == 1000000L, s"hub(2)=${got(2L)._1}")
    assert(got(3L)._2 == 1000000L, s"auth(3)=${got(3L)._2}")
    assert(got(3L)._1 == 0L && got(4L)._1 == 0L)
    assert(got(1L)._2 == 0L && got(2L)._2 == 0L)
    assert(got(1L)._1 > 0L && got(1L)._1 < 1000000L)
    assert(got(4L)._2 > 0L && got(4L)._2 < 1000000L)
  }
}
