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

  test("lengthBuckets: exact pow-2 edges, top-bucket clamp+truncate, " +
    "batch counts under the token budget") {
    // lens: 1→16(edge min), 16→16(exact edge), 17→32, 64→64, 100→128,
    // 300→clamped to 256 and TRUNCATED to 256 real tokens
    val lens = Seq(1L, 16L, 17L, 64L, 100L, 300L)
      .zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "n")
    val got = Packing.lengthBuckets(lens, col("n"),
        minBucket = 16L, maxBucket = 256L, budgetTokens = 512L)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // bucket -> (n_seqs, real, padded, waste, n_batches@512)
    assert(got(16L) == ((2L, 17L, 32L, 15L, 1L)))   // 512/16=32 per batch
    assert(got(32L) == ((1L, 17L, 32L, 15L, 1L)))
    assert(got(64L) == ((1L, 64L, 64L, 0L, 1L)))    // zero waste at edge
    assert(got(128L) == ((1L, 100L, 128L, 28L, 1L)))
    assert(got(256L) == ((1L, 256L, 256L, 0L, 1L))) // truncated overflow
    // batch count rounds UP: 3 seqs of bucket 256 at budget 512 → 2
    val many = (1L to 3L).map(i => (i, 200L)).toDF("id", "n")
    val b = Packing.lengthBuckets(many, col("n"), 16L, 256L, 512L)
      .select("n_batches").as[Long].head()
    assert(b == 2L)
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

  test("binPackFFD: textbook first-fit-decreasing assignment, oversize " +
    "docs get a bin of their own, shards pack independently, " +
    "layout-independent") {
    val df = Seq(
      ("s", 1L, 6L), ("s", 2L, 5L), ("s", 3L, 4L), ("s", 4L, 3L),
      ("s", 5L, 2L), ("s", 9L, 12L), // oversize: own bin
      ("t", 7L, 10L), ("t", 8L, 1L)).toDF("src", "id", "tok")
    def run(d: org.apache.spark.sql.DataFrame) =
      Packing.binPackFFD(d, "src", "id", "tok", maxTokens = 10)
        .as[(String, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._4).toMap
    val got = run(df)
    // sorted desc: 12, 6, 5, 4, 3, 2 -> bins: 12|{6,4}|{5,3,2}
    assert(got(("s", 9L)) == got(("s", 9L))) // own bin...
    assert(got(("s", 1L)) == got(("s", 3L)), "6 and 4 share a bin")
    assert(got(("s", 2L)) == got(("s", 4L)) &&
      got(("s", 2L)) == got(("s", 5L)), "5, 3, 2 share a bin")
    assert(Set(got(("s", 9L)), got(("s", 1L)), got(("s", 2L))).size == 3)
    // capacity: no bin over 10 except the oversize singleton
    val tok = Map(1L -> 6L, 2L -> 5L, 3L -> 4L, 4L -> 3L, 5L -> 2L,
      9L -> 12L, 7L -> 10L, 8L -> 1L)
    got.toSeq.groupBy { case ((src, _), bin) => (src, bin) }
      .foreach { case ((src, bin), members) =>
        val ids = members.map(_._1._2)
        val fill = ids.map(tok).sum
        assert(fill <= 10L || ids == Seq(9L),
          s"bin ($src, $bin) overfilled: $fill from $ids")
      }
    // shard t packs independently (10 fills a bin; 1 opens the next
    // only if 10+1 > 10)
    assert(got(("t", 7L)) != got(("t", 8L)))
    assert(run(df.repartition(7)) == got, "layout changed the packing")
  }
}
