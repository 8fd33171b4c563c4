package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  // shard a: 10+20+30+40 = 100 tokens; shard b: 7 tokens
  private lazy val docs = Seq(
    ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L), ("a", 4L, 40L),
    ("b", 9L, 7L))
    .toDF("shard", "id", "tok")

  private lazy val packed = Packing.packChunks(
      docs, $"shard", $"id", $"tok", budget = 32L)
    .select($"shard", $"id", $"start_tok", $"first_chunk", $"last_chunk")
    .as[(String, Long, Long, Long, Long)].collect()
    .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap

  test("docs tile the shard token stream contiguously, in order") {
    assert(packed(("a", 1L)) == ((0L, 0L, 0L)))    // [0,10)   chunk 0
    assert(packed(("a", 2L)) == ((10L, 0L, 0L)))   // [10,30)  chunk 0
    assert(packed(("a", 3L)) == ((30L, 0L, 1L)))   // [30,60)  straddles
    assert(packed(("a", 4L)) == ((60L, 1L, 3L)))   // [60,100) spans 1-3
    assert(packed(("b", 9L)) == ((0L, 0L, 0L)))    // shards independent
  }

  test("packStats: chunk count and final-chunk waste per shard") {
    val stats = Packing.packStats(docs, $"shard", $"tok", budget = 32L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(stats("a") == ((100L, 4L, 28L))) // ceil(100/32)=4, 128-100
    assert(stats("b") == ((7L, 1L, 25L)))
  }

  test("slidingChunks: coverage, overlap, and minimal chunk count") {
    // 7 tokens, size 5, overlap 2 (stride 3) → ceil((7-2)/3) = 2 chunks
    val df = Seq((1L, (0 until 7).map(i => s"t$i"))).toDF("id", "toks")
    val got = Packing.slidingChunks(df, col("toks"), 5, 2)
      .select("chunk_id", "chunk").as[(Int, Seq[String])].collect()
      .sortBy(_._1).toSeq
    assert(got == Seq(
      0 -> Seq("t0", "t1", "t2", "t3", "t4"),
      1 -> Seq("t3", "t4", "t5", "t6")))
    // consecutive chunks share exactly `overlap` tokens; union covers all
    assert(got(0)._2.takeRight(2) == got(1)._2.take(2))
    assert(got.flatMap(_._2).distinct.size == 7)
  }

  test("slidingChunks: short doc yields one whole-doc chunk; no " +
      "redundant tail chunk when the previous chunk already covers it") {
    val df = Seq((1L, Seq("a", "b")), (2L, (0 until 8).map(_.toString)))
      .toDF("id", "toks")
    val got = Packing.slidingChunks(df, col("toks"), 5, 2)
      .groupBy("id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L) // 2 tokens < chunkSize
    assert(got(2L) == 2L) // starts 0,3: [0..4],[3..7] — start 6 redundant
  }

  test("plan: one shuffle on the shard key, no global sort") {
    val plan = Packing.packChunks(
      docs, $"shard", $"id", $"tok", budget = 32L)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1)
    assert(!plan.contains("rangepartitioning"),
      "chunk ids must be shard-local, never a global sort")
  }
}
