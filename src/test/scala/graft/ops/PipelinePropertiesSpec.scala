package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the sampling / packing / layout primitives —
  * seeded generators, one DataFrame per property (per-sample jobs
  * would be hundreds of Spark rounds). */
class PipelinePropertiesSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(seed + i)))

  test("splitAssign: every key gets exactly one label, whatever the weights") {
    val weightsGen = for {
      n <- Gen.choose(2, 5)
      ws <- Gen.listOfN(n, Gen.choose(0.0, 10.0))
    } yield ws.zipWithIndex.map { case (w, i) => s"s$i" -> w }
    val ids = spark.range(0, 2000).toDF("id")
    for (weights <- samples(weightsGen, 8, 10L)
         if weights.map(_._2).sum > 0) {
      val labels = weights.map(_._1).toSet
      val got = ids.select(
          Sampling.splitAssign($"id", weights, salt = "p").as("s"))
        .groupBy("s").count().as[(String, Long)].collect()
      assert(got.map(_._2).sum == 2000L) // exhaustive
      assert(got.map(_._1).toSet.subsetOf(labels)) // no invented labels
    }
  }

  test("sampleByHash: fraction monotonicity — smaller fraction ⊆ larger") {
    val ids = spark.range(0, 3000).toDF("id")
    def keep(f: Double): Set[Long] =
      Sampling.sampleByHash(ids, $"id", f, salt = "m")
        .as[Long].collect().toSet
    val (s10, s30, s60) = (keep(0.1), keep(0.3), keep(0.6))
    assert(s10.subsetOf(s30) && s30.subsetOf(s60),
      "thresholded draws must nest by construction")
  }

  test("packChunks: docs tile each shard exactly, for random token lists") {
    val docGen = Gen.choose(1L, 50L)
    val toks = samples(docGen, 200, 20L)
    val docs = toks.zipWithIndex
      .map { case (t, i) => (s"sh${i % 5}", i.toLong, t) }
      .toDF("shard", "id", "tok")
    val packed = Packing.packChunks(docs, $"shard", $"id", $"tok", 64L)
      .select($"shard", $"id", $"tok", $"start_tok", $"first_chunk",
        $"last_chunk")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    for ((_, rows) <- packed) {
      val sorted = rows.sortBy(_._2)
      // starts are the exclusive prefix sums — contiguous tiling
      assert(sorted.map(_._4).toSeq ==
        sorted.map(_._3).scanLeft(0L)(_ + _).init.toSeq)
      // chunk spans follow from start/len by the div formula
      for ((_, _, tok, start, fc, lc) <- sorted) {
        assert(fc == start / 64L)
        assert(lc == (start + tok - 1) / 64L)
        assert(fc <= lc)
      }
    }
  }

  test("zValue: order-embedding on each axis when the other is fixed") {
    val pairGen = for {
      a <- Gen.choose(0, 65535)
      b <- Gen.choose(0, 65535)
    } yield (a, b)
    val pairs = samples(pairGen, 300, 30L).distinct
    val zs = pairs.toDF("a", "b")
      .select($"a", $"b", Layout.zValue($"a", $"b").as("z"))
      .as[(Int, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    for (((a, b), z) <- zs) {
      // bumping one coordinate strictly increases z (fixed other axis)
      for (((a2, b2), z2) <- zs if a2 == a && b2 > b) assert(z2 > z)
      for (((a2, b2), z2) <- zs if b2 == b && a2 > a) assert(z2 > z)
    }
  }

  test("weightedMix: per-source membership equals sampleByHash at that salt") {
    // the mixture is EXACTLY the union of independently-salted samples:
    // membership per source must replay through the primitive
    val ids = spark.range(0, 2000).toDF("id")
    for (weights <- samples(Gen.listOfN(3, Gen.choose(0.0, 1.0)), 5, 77L)) {
      val srcs = weights.zipWithIndex.map { case (w, i) =>
        ids.withColumn("src", lit(s"s$i")) -> w
      }
      val mixed = Sampling.weightedMix(srcs, "id", salt = "wm")
        .select("src", "id").as[(String, Long)].collect().toSet
      weights.zipWithIndex.foreach { case (w, i) =>
        val direct = Sampling.sampleByHash(ids, $"id", w, s"wm#$i")
          .as[Long].collect().toSet
        assert(mixed.filter(_._1 == s"s$i").map(_._2) == direct,
          s"source $i at weight $w diverged from the primitive")
      }
    }
  }

  test("takeTokenBudget: monotone in budget; never exceeds it") {
    val docs = spark.range(0, 1000).toDF("id")
      .select($"id", ($"id" % 3).cast("string").as("shard"),
        (($"id" % 7) + 1).as("toks"))
    def slice(b: Long): Map[String, Seq[Long]] =
      Sampling.takeTokenBudget(docs, Seq("shard"), $"id", $"toks", b)
        .select("shard", "id").as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    val budgets = Seq(50L, 200L, 800L)
    val slices = budgets.map(slice)
    for (Seq(small, large) <- slices.sliding(2)) {
      for ((shard, idsSmall) <- small) {
        assert(idsSmall.toSet.subsetOf(
          large.getOrElse(shard, Seq.empty).toSet),
          s"budget growth must only ADD rows (shard $shard)")
      }
    }
    // the kept token sum respects the budget per shard
    val kept = Sampling.takeTokenBudget(docs, Seq("shard"), $"id", $"toks", 200L)
      .groupBy("shard").agg(sum("toks").as("t"))
      .as[(String, Long)].collect()
    kept.foreach { case (s, t) => assert(t <= 200L, s"shard $s over budget") }
  }
}
