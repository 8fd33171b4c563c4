package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphStoreSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private def readMap(dir: String): Map[Long, Long] =
    GraphStore.read(spark, dir).as[(Long, Long)].collect().toMap

  private def fullCC(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap

  test("multi-batch folds equal one full CC over the union " +
      "(random graphs, random batch splits)") {
    val rnd = new scala.util.Random(131)
    (1 to 3).foreach { trial =>
      val n = 80
      val all = (1 to 120).map(_ =>
          (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val nBatches = 3
      val batches = all.groupBy(e => rnd.nextInt(nBatches)).toSeq
        .sortBy(_._1).map(_._2)
      val dir = graft.core.Scratch.dir(s"graphstore_rand_$trial")
      GraphStore.init(
        Graph.connectedComponents(batches.head.toDF("a", "b")), dir,
        targetRowsPerBucket = 16)
      batches.tail.foreach(b =>
        GraphStore.applyBatch(spark, dir, b.toDF("a", "b")))
      assert(readMap(dir) == fullCC(all),
        s"trial $trial: folded store != full rebuild")
    }
  }

  test("merges ride the rebase table without rewriting member rows; " +
      "new nodes append; compact folds and preserves the labeling") {
    val dir = graft.core.Scratch.dir("graphstore_rebase")
    // two prior components far apart in id space -> distinct buckets
    GraphStore.init(
      Graph.connectedComponents(
        Seq((1L, 2L), (1000L, 1001L)).toDF("a", "b")),
      dir, targetRowsPerBucket = 2)
    // a bridge merges them; a disjoint pair is brand-new
    val a1 = GraphStore.applyBatch(spark, dir,
      Seq((2L, 1000L), (5000L, 5001L)).toDF("a", "b"))
    assert(a1.merges >= 1 && a1.newNodes == 2)
    val expect = Map(1L -> 1L, 2L -> 1L, 1000L -> 1L, 1001L -> 1L,
      5000L -> 5000L, 5001L -> 5000L)
    assert(readMap(dir) == expect)
    // member rows of the merged component were NOT rewritten: the
    // stored raw label of the far bucket still carries the old
    // canonical id, resolved only through the rebase table
    val raw = spark.read.parquet(s"$dir/labels")
      .select(col("node"), col("component"))
      .as[(Long, Long)].collect().toMap
    assert(raw(1000L) == 1000L && raw(1001L) == 1000L,
      "merge rewrote pass-through member rows")
    // compact folds the rebase into the rows; labeling unchanged
    GraphStore.compact(spark, dir)
    assert(readMap(dir) == expect)
    val rawC = spark.read.parquet(s"$dir/labels")
      .select(col("node"), col("component"))
      .as[(Long, Long)].collect().toMap
    assert(rawC(1000L) == 1L && rawC(1001L) == 1L)
    // post-compact batches keep folding correctly
    GraphStore.applyBatch(spark, dir, Seq((5001L, 1L)).toDF("a", "b"))
    assert(readMap(dir) ==
      expect.map { case (k, _) => k -> 1L })
    // the amortization hook: the fold above re-grew the rebase table
    // (5000-class merged under 1), so a zero threshold compacts and a
    // generous one does not
    assert(GraphStore.rebaseSize(spark, dir) > 0)
    assert(!GraphStore.maybeCompact(spark, dir, maxRebaseRows = 100))
    assert(GraphStore.maybeCompact(spark, dir, maxRebaseRows = 0))
    assert(GraphStore.rebaseSize(spark, dir) == 0)
    assert(readMap(dir) == expect.map { case (k, _) => k -> 1L })
  }

  test("chained merges across batches stay one-hop resolved " +
      "(rebase compose flattens) and a new node can be the class min") {
    val dir = graft.core.Scratch.dir("graphstore_chain")
    GraphStore.init(
      Graph.connectedComponents(
        Seq((10L, 11L), (20L, 21L), (30L, 31L)).toDF("a", "b")),
      dir, targetRowsPerBucket = 2)
    GraphStore.applyBatch(spark, dir, Seq((11L, 20L)).toDF("a", "b"))
    GraphStore.applyBatch(spark, dir, Seq((21L, 30L)).toDF("a", "b"))
    // 10..31 all one component, canonical min 10
    assert(readMap(dir).view.filterKeys(_ >= 10L).toMap ==
      Seq(10L, 11L, 20L, 21L, 30L, 31L).map(_ -> 10L).toMap)
    // rebase stays transitively compressed: every entry resolves in
    // one hop (no __to value is itself a __from key)
    val rb = graft.sources.Versioned
      .readCurrent(spark, s"$dir/rebase")
      .as[(Long, Long)].collect()
    val keys = rb.map(_._1).toSet
    assert(rb.forall(e => !keys.contains(e._2)),
      s"rebase not flattened: $rb")
    // new node 5 bridges two components and becomes the class min
    GraphStore.applyBatch(spark, dir, Seq((5L, 10L)).toDF("a", "b"))
    assert(readMap(dir).values.toSet == Set(5L))
  }

  test("an EMPTY batch is a no-op: no merges, no appends, state intact") {
    val dir = graft.core.Scratch.dir("graphstore_empty")
    GraphStore.init(
      Graph.connectedComponents(Seq((1L, 2L)).toDF("a", "b")), dir)
    val a = GraphStore.applyBatch(spark, dir,
      Seq.empty[(Long, Long)].toDF("a", "b"))
    assert(a == GraphStore.Applied(0, 0, 0))
    assert(readMap(dir) == Map(1L -> 1L, 2L -> 1L))
  }

  test("re-delivered batch converges (crash between rebase publish " +
      "and append replays to the same state)") {
    val dir = graft.core.Scratch.dir("graphstore_replay")
    GraphStore.init(
      Graph.connectedComponents(Seq((1L, 2L), (7L, 8L)).toDF("a", "b")),
      dir, targetRowsPerBucket = 2)
    val batch = Seq((2L, 7L), (40L, 41L)).toDF("a", "b")
    GraphStore.applyBatch(spark, dir, batch)
    val once = readMap(dir)
    // replay the identical batch: merges resolve to identity quotient
    // edges, appends already present -> state unchanged
    val again = GraphStore.applyBatch(spark, dir, batch)
    assert(again.merges == 0 && again.newNodes == 0)
    assert(readMap(dir) == once)
  }

  test("quantile bucketing: a skewed id space (dense pocket + far " +
      "outliers) still gets equal-count buckets, and folds stay exact") {
    // fixed-width shift would land ~every row in one bucket here:
    // span ≈ 2^55 forces the widest shift, but 2048 of 2052 nodes
    // live in [0, 2048)
    val pocket = (0L until 2048L by 2L).map(i => (i, i + 1))
    val outliers = Seq((1L << 40, (1L << 40) + 1L),
      (1L << 55, (1L << 55) + 1L))
    val prior = pocket ++ outliers
    val dir = graft.core.Scratch.dir("graphstore_quant")
    GraphStore.init(Graph.connectedComponents(prior.toDF("a", "b")),
      dir, targetRowsPerBucket = 256, quantileBuckets = true)
    val counts = spark.read.parquet(s"$dir/labels")
      .groupBy("__pt").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(counts.size >= 6, s"expected many buckets, got $counts")
    assert(counts.values.max <= 600,
      s"skew defeated the equal-count buckets: $counts")
    // a pocket-local batch + a brand-new far node folds exactly
    val batch = Seq((0L, 2L), (0L, 999999999999L))
    val applied = GraphStore.applyBatch(spark, dir, batch.toDF("a", "b"))
    assert(applied.newNodes == 1)
    assert(readMap(dir) == fullCC(prior ++ batch))
    // compact under quantile meta preserves the labeling
    GraphStore.compact(spark, dir)
    assert(readMap(dir) == fullCC(prior ++ batch))
  }

  test("operation-sequence fuzz: random batches interleaved with " +
      "compacts, empty batches, and re-deliveries always equal one " +
      "full CC over the union") {
    val rnd = new scala.util.Random(223)
    (1 to 3).foreach { trial =>
      val n = 64
      val all = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val init = (1 to 12).map(_ =>
          (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      all ++= init
      val dir = graft.core.Scratch.dir(s"graphstore_fuzz_$trial")
      GraphStore.init(
        Graph.connectedComponents(init.toDF("a", "b")), dir,
        targetRowsPerBucket = 8,
        quantileBuckets = trial == 2) // one trial under quantile meta
      var lastBatch: Seq[(Long, Long)] = init
      (1 to 8).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 => GraphStore.compact(spark, dir)
          case 1 => // empty batch
            GraphStore.applyBatch(spark, dir,
              Seq.empty[(Long, Long)].toDF("a", "b")): Unit
          case 2 => // re-deliver the previous batch (crash replay)
            GraphStore.applyBatch(spark, dir,
              lastBatch.toDF("a", "b")): Unit
          case _ =>
            val b = (1 to 1 + rnd.nextInt(6)).map(_ =>
                (rnd.nextInt(2 * n).toLong, rnd.nextInt(2 * n).toLong))
              .filter(e => e._1 != e._2)
            if (b.nonEmpty) {
              all ++= b
              lastBatch = b
              GraphStore.applyBatch(spark, dir, b.toDF("a", "b")): Unit
            }
        }
      }
      assert(readMap(dir) == fullCC(all.toSeq),
        s"trial $trial: fuzzed store != full rebuild")
    }
  }

  test("maintenance is bucket-pruned: a batch in one id region " +
      "reads and writes only that region's buckets") {
    val dir = graft.core.Scratch.dir("graphstore_pruned")
    // 4096 nodes as 2048 pair-components over a dense id range
    val prior = (0L until 4096L by 2L).map(i => (i, i + 1))
    GraphStore.init(Graph.connectedComponents(prior.toDF("a", "b")),
      dir, targetRowsPerBucket = 256)
    val labelRoot = new java.io.File(s"$dir/labels")
    val nBuckets = labelRoot.listFiles()
      .count(_.getName.startsWith("__pt="))
    assert(nBuckets >= 8, s"expected many buckets, got $nBuckets")
    // batch confined to the lowest id region + one new local node
    val applied = GraphStore.applyBatch(spark, dir,
      Seq((0L, 2L), (1L, 3L), (0L, 4097000L)).toDF("a", "b"))
    assert(applied.buckets <= 3,
      s"batch touched ${applied.buckets} buckets — pruning failed")
    assert(readMap(dir).view.filterKeys(_ <= 5L).toMap ==
      Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 4L, 5L -> 4L))
  }
}
