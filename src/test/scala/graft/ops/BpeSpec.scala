package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  // the Sennrich-paper-style corpus: low×5 lower×2 newest×6 widest×3
  private lazy val corpus = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
    .zipWithIndex.map { case (w, i) => (i.toLong, w) }
    .toDF("doc_id", "text")

  test("learnMerges reproduces the hand-computed merge sequence with " +
    "lexicographic tie-breaks") {
    // pair counts round 1: (e,s)=9 (s,t)=9 (w,e)=8 (l,o)=7 (o,w)=7 ...
    //   tie at 9 → lexicographic → (e,s)
    // round 2: (es,t)=9 wins
    // round 3: (l,o)=7 vs (o,w)=7 → lexicographic → (l,o)
    val merges = Bpe.learnMerges(
      Bpe.wordCounts(corpus, col("text")), numMerges = 3)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o")))
  }

  test("applyMerges is the greedy lowest-rank loop") {
    val rank = Seq(("e", "s"), ("es", "t"), ("l", "o")).zipWithIndex.toMap
    assert(Bpe.applyMerges("newest", rank) == Vector("n", "e", "w", "est"))
    assert(Bpe.applyMerges("low", rank) == Vector("lo", "w"))
    assert(Bpe.applyMerges("a", rank) == Vector("a"))
    assert(Bpe.applyMerges("", rank) == Vector.empty)
  }

  test("tokenize applies merges map-side and counts tokens") {
    val merges = Bpe.learnMerges(
      Bpe.wordCounts(corpus, col("text")), numMerges = 3)
    val got = Bpe.tokenize(
        corpus.filter(col("doc_id").isin(0L, 7L)), "doc_id",
        col("text"), merges)
      .as[(Long, Seq[String], Long)].collect().map(r => r._1 -> r).toMap
    assert(got(0L)._2 == Seq("lo", "w") && got(0L)._3 == 2L)
    assert(got(7L)._2 == Seq("n", "e", "w", "est") && got(7L)._3 == 4L)
  }

  test("learning stops early when no pair repeats") {
    val tiny = Seq((1L, "ab"), (2L, "cd")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(
      Bpe.wordCounts(tiny, col("text")), numMerges = 10)
    assert(merges.isEmpty, s"no repeated pair exists: $merges")
  }

  test("merge sequence is partition-independent") {
    val wc = Bpe.wordCounts(corpus.repartition(7), col("text"))
    assert(Bpe.learnMerges(wc.repartition(5), 3) ==
      Seq(("e", "s"), ("es", "t"), ("l", "o")))
  }
}
