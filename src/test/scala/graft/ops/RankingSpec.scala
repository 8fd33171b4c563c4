package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RankingSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  // 3-doc corpus with known term statistics:
  //   "spark" in all 3 docs (df=3), "shuffle" in 1 (df=1)
  private lazy val docs = Seq(
    (1L, "spark shuffle spark"),
    (2L, "spark join"),
    (3L, "spark scan scan scan"))
    .toDF("doc_id", "text")
    .withColumn("toks", Text.words(col("text")))

  test("tfIdf computes raw tf, df, and smoothed idf exactly") {
    val got = Ranking.tfIdf(docs, "doc_id", col("toks"), docCount = 3L)
      .orderBy("doc_id", "term")
      .as[(Long, String, Long, Long, Double)].collect().toSeq
    def idf(df: Long): Double = math.log(4.0 / (df + 1.0)) + 1.0
    assert(got == Seq(
      (1L, "shuffle", 1L, 1L, 1 * idf(1)),
      (1L, "spark", 2L, 3L, 2 * idf(3)),
      (2L, "join", 1L, 1L, 1 * idf(1)),
      (2L, "spark", 1L, 3L, 1 * idf(3)),
      (3L, "scan", 3L, 1L, 3 * idf(1)),
      (3L, "spark", 1L, 3L, 1 * idf(3))))
  }

  test("topTerms keeps the k highest-weight terms per doc") {
    val scored = Ranking.tfIdf(docs, "doc_id", col("toks"), docCount = 3L)
    val got = Ranking.topTerms(scored, "doc_id", k = 1)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    // rare terms win where tf is equal (docs 2, 3); in doc 1 the
    // doubled "spark" (2·1.0) outweighs the rare "shuffle" (ln2+1)
    assert(got == Map(1L -> "spark", 2L -> "join", 3L -> "scan"))
  }

  test("bm25 ranks tf-heavy docs above low-tf docs for a rare term") {
    val scal = docs.agg(count(lit(1)), sum(size(col("toks")).cast("long")))
      .collect()(0)
    val avgDl = scal.getLong(1).toDouble / scal.getLong(0)
    val got = Ranking.bm25(docs, "doc_id", col("toks"),
        query = Seq("scan", "spark"), docCount = 3L, avgDl = avgDl)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    // doc 3 matches both query terms, one with tf=3 — must dominate
    assert(got(3L) > got(1L) && got(3L) > got(2L))
    // every score is positive and finite
    assert(got.values.forall(v => v > 0 && java.lang.Double.isFinite(v)))
  }

  test("bm25 is reproducible across runs (ordered fold, no float sum)") {
    val run = () => Ranking.bm25(
        docs.repartition(7), "doc_id", col("toks"),
        query = Seq("scan", "spark", "join"), docCount = 3L, avgDl = 3.0)
      .as[(Long, Double)].collect().toMap
    val a = run(); val b = run()
    assert(a.forall { case (k, v) =>
      java.lang.Double.doubleToLongBits(b(k)) ==
        java.lang.Double.doubleToLongBits(v) })
  }

  test("phraseMatches: adjacency intersection counts overlapping and " +
      "repeated occurrences, any phrase length") {
    val corpus = Seq(
      (1L, "a b c a b c"),     // "a b c" twice
      (2L, "a a a a"),         // "a a a" twice (overlapping starts)
      (3L, "a b x c"),         // no "a b c"
      (4L, "c b a"))           // reversed — no match
      .toDF("doc_id", "text")
      .withColumn("toks", Text.words(col("text")))
    val postings = Ranking.positionalPostings(corpus, "doc_id", col("toks"))
    def matches(ph: Seq[String]): Map[Long, Long] =
      Ranking.phraseMatches(postings, "doc_id", ph)
        .as[(Long, Long)].collect().toMap
    assert(matches(Seq("a", "b", "c")) == Map(1L -> 2L))
    assert(matches(Seq("a", "a", "a")) == Map(2L -> 2L))
    assert(matches(Seq("a")) == Map(1L -> 2L, 2L -> 4L, 3L -> 1L, 4L -> 1L))
    // postings-join result == per-doc positional rescan (the oracle
    // formulation) on the corpus face's own phrase
    val rescan = corpus.select(col("doc_id"),
        size(filter(
          sequence(lit(0), size(col("toks")) - 2),
          i => element_at(col("toks"), (i + 1).cast("int")) === "a" &&
            element_at(col("toks"), (i + 2).cast("int")) === "b"))
          .cast("long").as("n"))
      .filter(col("n") > 0)
      .as[(Long, Long)].collect().toMap
    assert(matches(Seq("a", "b")) == rescan)
  }

  test("lexicalOverlapTopK: tf-weighted overlap, self excluded, " +
      "deterministic ties") {
    val corpus = Seq(
      (1L, "spark join join"),   // the query doc
      (2L, "join join join"),    // overlap 3 on "join"
      (3L, "spark scan"),        // overlap 1 on "spark"
      (4L, "spark join"),        // overlap 2
      (5L, "scan sort"))         // no overlap — absent
      .toDF("doc_id", "text")
      .withColumn("toks", Text.words(col("text")))
    val got = Ranking.lexicalOverlapTopK(
        corpus, "doc_id", col("toks"),
        corpus.filter(col("doc_id") === 1), "doc_id", col("toks"), k = 10)
      .as[(Long, Long, Long, Int)].collect().toSeq.sortBy(_._4)
    assert(got == Seq(
      (1L, 2L, 3L, 1), (1L, 4L, 2L, 2), (1L, 3L, 1L, 3)))
  }

  test("rrfFuse: exact rational fusion of two lists, missing entries " +
      "contribute nothing, ordering by num/den") {
    val lex = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    val dense = Seq((0L, 11L, 1), (0L, 13L, 2))
      .toDF("query_id", "neighbor_id", "rank")
    val got = Ranking.rrfFuse(Seq(lex, dense), k = 10)
      .as[(Long, Long, Long, Long, Int)].collect().toSeq.sortBy(_._5)
    // doc 11: both lists (ranks 2, 1) → num=(62)+(61)=123, den=62*61
    // doc 10: lex rank 1 → 1/61; doc 13: dense rank 2 → 1/62;
    // doc 12: lex rank 3 → 1/63
    assert(got == Seq(
      (0L, 11L, 123L, 3782L, 1),
      (0L, 10L, 1L, 61L, 2),
      (0L, 13L, 1L, 62L, 3),
      (0L, 12L, 1L, 63L, 4)))
    // 1/(61) + 1/(62) really is 123/3782 — the fraction is exact,
    // not an approximation artifact
    assert(math.abs(123.0 / 3782.0 - (1.0 / 61 + 1.0 / 62)) < 1e-15)
  }

  test("btStrengths: transitive evidence separates equal win counts " +
      "(A beat the stronger B), the MM actually iterates, and " +
      "self-matches carry nothing") {
    import org.apache.spark.sql.functions._
    // A beats B 3x, B beats C 3x, A never meets C: wins(A)=wins(B)=3
    // but A's wins came against a stronger opponent -> A > B > C
    val m = (Seq.fill(3)(("A", "B", "A")) ++ Seq.fill(3)(("B", "C", "B"))
      ++ Seq(("A", "A", "A"))) // self-match must drop
      .toDF("pa", "pb", "w")
    val got = Ranking.btStrengths(m, "pa", "pb", "w", iters = 20)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("A")._1 == 3L && got("B")._1 == 3L && got("C")._1 == 0L)
    assert(got("A")._2 == 3L && got("B")._2 == 6L)
    assert(got("A")._3 > got("B")._3,
      s"A must outrank B on transitive evidence: $got")
    assert(got("B")._3 > got("C")._3, got.toString)
    // mean pinned at 1e6 (trunc): sum within P of P*1e6
    val tot = got.values.map(_._3).sum
    assert(tot <= 3000000L && tot > 3000000L - 3, got.toString)
  }

  test("btStrengths: the loud bounds fire") {
    import org.apache.spark.sql.functions._
    val m = Seq(("A", "B", "A")).toDF("pa", "pb", "w")
    val e = intercept[IllegalArgumentException] {
      Ranking.btStrengths(m, "pa", "pb", "w", maxPlayers = 1)
    }
    assert(e.getMessage.contains("maxPlayers"))
  }

  test("zipfFit recovers slope -1 on an exact 1/rank law") {
    import org.apache.spark.sql.functions.col
    // freq_r = 60/r for r = 1..6 (all integral): ln f = ln 60 - ln r,
    // so the OLS slope of ln f on ln rank is exactly -1 up to the
    // micro-grid snap of each ln
    val tokens = (1 to 6).flatMap(r => Seq.fill(60 / r)(s"w$r"))
    val docs = Seq(("g", tokens)).toDF("source", "w")
    val got = Ranking.zipfFit(docs, "source", col("w"),
        maxRank = 200, minFreq = 2L)
      .select("source", "n", "slope")
      .as[(String, Long, Double)].collect().head
    assert(got._1 == "g" && got._2 == 6L)
    assert(math.abs(got._3 + 1.0) < 1e-4, s"slope ${got._3}")
  }

  test("zipfFit: minFreq trims the hapax tail, maxRank caps the fit") {
    import org.apache.spark.sql.functions.col
    val tokens = Seq.fill(8)("a") ++ Seq.fill(4)("b") ++
      Seq.fill(2)("c") ++ Seq("hapax")
    val docs = Seq(("g", tokens)).toDF("source", "w")
    val n = Ranking.zipfFit(docs, "source", col("w"),
        maxRank = 2, minFreq = 2L)
      .select("n").as[Long].collect().head
    assert(n == 2L) // hapax dropped by minFreq, c by maxRank
    val e = intercept[IllegalArgumentException] {
      Ranking.zipfFit(docs, "source", col("w"), maxRank = 1)
    }
    assert(e.getMessage.contains("maxRank"))
  }
}
