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
}
