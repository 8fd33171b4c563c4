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

  // ---- interpolated Kneser-Ney ----

  private lazy val kn = LangModel.trainKn(
    Seq((1L, "a b a b")).toDF("doc_id", "text"), "doc_id", toks)

  private def knNllOf(text: String): (Long, Double) =
    LangModel.scoreKn(
        Seq((9L, text)).toDF("doc_id", "text"), "doc_id", toks, kn)
      .select(col("n_bigrams"), col("avg_nll"))
      .as[(Long, Double)].first()

  test("KN tables carry the textbook counts (margins, continuation, totals)") {
    assert(kn.bigrams.as[(String, String, Long)].collect().toSet ==
      Set(("a", "b", 2L), ("b", "a", 1L)))
    assert(kn.contexts.as[(String, Long, Long)].collect().toSet ==
      Set(("a", 2L, 1L), ("b", 1L, 1L)))
    assert(kn.continuation.as[(String, Long)].collect().toSet ==
      Set(("b", 1L), ("a", 1L)))
    assert(kn.totals.as[(Long, Long)].first() == ((2L, 2L)))
  }

  test("KN self-score matches the hand computation bigram by bigram") {
    // Pc(b)=Pc(a)=(1+.5)/(2+.5*2)=0.5; P(b|a)=(max(2-.75,0)+.75*1*.5)/2
    // = 0.8125; P(a|b)=(0.25+0.375)/1=0.625
    val (n, nll) = knNllOf("a b a b")
    val expect =
      -(round9(math.log(0.8125)) * 2 + round9(math.log(0.625))) / 3
    assert(n == 3L)
    assert(round9(nll) == expect.setScale(9, BigDecimal.RoundingMode.HALF_UP))
  }

  test("KN unseen bigram under a seen context keeps only the backoff mass") {
    // P(a|a) = (max(0-.75,0) + .75*1*Pc(a))/2 = 0.375/2 = 0.1875
    val (_, nll) = knNllOf("a a")
    assert(round9(nll) == round9(-math.log(0.1875)))
  }

  test("KN wholly unseen context backs off to the continuation distribution") {
    // P(c|c) = Pc(c) = (0+.5)/(2+.5*2) = 1/6
    val (_, nll) = knNllOf("c c")
    assert(round9(nll) == round9(math.log(6.0)))
  }

  test("KN weighs continuation count, not raw frequency (the Francisco case)") {
    // 'the' and 'francisco' both occur 4x as successors, but 'the'
    // follows 4 distinct contexts and 'francisco' only 1 — after an
    // unseen context, KN must prefer 'the'; add-k treats them equally.
    val docs = (Seq("a the", "b the", "c the", "d the") ++
      Seq.fill(4)("e francisco")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val lmF = LangModel.trainKn(docs, "doc_id", toks)
    val probe = Seq((100L, "zz the"), (101L, "zz francisco"))
      .toDF("doc_id", "text")
    val scores = LangModel.scoreKn(probe, "doc_id", toks, lmF)
      .select(col("doc_id"), col("avg_nll")).as[(Long, Double)]
      .collect().toMap
    assert(scores(100L) < scores(101L),
      s"equal-frequency tokens must rank by continuation count: $scores")
  }

  test("KN score is independent of partitioning (exact decimal sum)") {
    val rnd = new scala.util.Random(7)
    val docs = (1L to 40L).map(i =>
      (i, (1 to 50).map(_ => s"w${rnd.nextInt(8)}").mkString(" ")))
      .toDF("doc_id", "text")
    val lm2 = LangModel.trainKn(docs, "doc_id", toks)
    val a = LangModel.scoreKn(docs, "doc_id", toks, lm2)
      .as[(Long, Long, Double)].collect().toSet
    val b = LangModel.scoreKn(docs.repartition(13), "doc_id", toks, lm2)
      .as[(Long, Long, Double)].collect().toSet
    assert(a == b)
  }

  test("DSIR composition: importance log-ratio (corpus_nll - target_nll) " +
      "is positive for target-like docs, negative for off-target") {
    val en = (1L to 10L).map(i => (i, "the cat sat on the mat"))
    val fr = (11L to 20L).map(i => (i, "le chat est sur le tapis"))
    val docs = (en ++ fr).toDF("doc_id", "text")
    val lmT = LangModel.train(docs.filter(col("doc_id") <= 10),
      "doc_id", toks)
    val lmC = LangModel.train(docs, "doc_id", toks)
    val tn = LangModel.scoreNll(docs, "doc_id", toks, lmT)
      .select(col("doc_id"), col("avg_nll").as("tn"))
    val cn = LangModel.scoreNll(docs, "doc_id", toks, lmC)
      .select(col("doc_id"), col("avg_nll").as("cn"))
    val ratios = tn.join(cn, Seq("doc_id"))
      .select(col("doc_id"), (col("cn") - col("tn")).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(ratios(1L) > 0, s"target-like doc must be selected: $ratios")
    assert(ratios(11L) < 0, s"off-target doc must be rejected: $ratios")
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
