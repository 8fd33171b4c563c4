package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LangModelSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private val toks = split(col("text"), " ")

  private def round9(x: Double): BigDecimal =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)

  // corpus "a b a b": n(a,b)=2, n(b,a)=1; contexts a→2, b→1; V=2
  private lazy val lm = LangModel.train(
    Seq((1L, "a b a b")).toDF("doc_id", "text"), "doc_id", toks)

  private def nllOf(text: String): (Long, Double) =
    LangModel.scoreNll(
        Seq((9L, text)).toDF("doc_id", "text"), "doc_id", toks, lm)
      .select(col("n_bigrams"), col("avg_nll"))
      .as[(Long, Double)].first()

  test("trained counts, contexts, and vocab are the textbook values") {
    assert(lm.bigrams.as[(String, String, Long)].collect().toSet ==
      Set(("a", "b", 2L), ("b", "a", 1L)))
    assert(lm.contexts.as[(String, Long)].collect().toSet ==
      Set(("a", 2L), ("b", 1L)))
    assert(lm.vocab.as[Long].first() == 2L)
  }

  test("self-scored NLL matches the hand computation bigram by bigram") {
    // P(b|a)=(2+.5)/(2+1)=2.5/3, P(a|b)=(1+.5)/(1+1)=0.75; the score
    // path rounds each ln to 9 decimals, sums exactly, divides by 3
    val (n, nll) = nllOf("a b a b")
    val expect = -(round9(math.log(2.5 / 3)) * 2 + round9(math.log(0.75))) / 3
    assert(n == 3L)
    assert(round9(nll) == expect.setScale(9, BigDecimal.RoundingMode.HALF_UP))
  }

  test("unseen bigram under a seen context backs off to k/(n_a+kV)") {
    val (_, nll) = nllOf("a a") // P(a|a) = 0.5/(2+1) = 1/6
    assert(round9(nll) == round9(-math.log(0.5 / 3)).abs)
  }

  test("wholly unseen context degrades to uniform 1/V") {
    val (_, nll) = nllOf("c c") // P = 0.5/(0+0.5*2) = 1/2
    assert(round9(nll) == round9(math.log(2.0)))
  }

  test("docs with fewer than two tokens are absent, not zero-scored") {
    val out = LangModel.scoreNll(
      Seq((1L, "solo"), (2L, "a b")).toDF("doc_id", "text"),
      "doc_id", toks, lm)
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(2L))
  }

  test("score is independent of partitioning (exact decimal sum)") {
    val rnd = new scala.util.Random(3)
    val docs = (1L to 40L).map(i =>
      (i, (1 to 50).map(_ => s"w${rnd.nextInt(8)}").mkString(" ")))
      .toDF("doc_id", "text")
    val lm2 = LangModel.train(docs, "doc_id", toks)
    val a = LangModel.scoreNll(docs, "doc_id", toks, lm2)
      .as[(Long, Long, Double)].collect().toSet
    val b = LangModel.scoreNll(docs.repartition(13), "doc_id", toks, lm2)
      .as[(Long, Long, Double)].collect().toSet
    assert(a == b)
  }

  test("out-of-distribution text scores a higher NLL than in-domain") {
    val clean = (1L to 30L).map(i => (i, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val lmC = LangModel.train(clean, "doc_id", toks)
    val probe = Seq((100L, "the cat sat on the mat"),
      (101L, "zq xv qj zz vx jq")).toDF("doc_id", "text")
    val scores = LangModel.scoreNll(probe, "doc_id", toks, lmC)
      .select(col("doc_id"), col("avg_nll")).as[(Long, Double)]
      .collect().toMap
    assert(scores(101L) > scores(100L) + 1.0,
      s"garbage must score clearly worse: $scores")
  }
}
