package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class LabelModelSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private val classes = Seq("x", "y")

  test("dsFit learns to trust the aligned voters over the coin flip") {
    // Two mostly-agreeing good LFs + one half-right LF. (With only
    // TWO voters and symmetric disagreement the accuracies are
    // genuinely unidentifiable — the third voter is what lets EM
    // attribute the disagreement.)
    val docs = (0 until 40).map { i =>
      val truth = if (i % 2 == 0) "x" else "y"
      val flip = if (truth == "x") "y" else "x"
      (i.toLong, truth,
        if (i % 5 == 0) flip else truth, // 80% right
        if (i % 4 < 2) truth else flip)  // 50% right
    }.toDF("id", "lf1", "lf2", "lf3")
    val votes = Seq(col("lf1"), col("lf2"), col("lf3"))
    val p = LabelModel.fit(docs, votes, classes, iters = 5)
    // lf1/lf2 are mutually symmetric when they disagree (the coin
    // flip cannot arbitrate), so EM lands both high and EQUAL — the
    // identifiable facts are the pair >> coin flip and coin ≈ 1/2
    assert(p.acc(0) > 850000L, s"accurate LF underrated: ${p.acc}")
    assert(p.acc(0) > p.acc(2) + 200000L,
      s"coin-flip LF not down-weighted: ${p.acc}")
    assert(math.abs(p.acc(2) - 500000L) < 50000L,
      s"coin flip should fit ~1/2: ${p.acc}")
    // where the aligned pair agrees, its vote wins over the coin flip
    val labeled = LabelModel.labelDocs(docs, votes, classes, p)
      .select("id", "lf1", "lf2", "y_hat")
      .as[(Long, String, String, String)].collect()
    assert(labeled.collect { case (_, a, b, y) if a == b => y == a }
      .forall(identity))
  }

  test("abstains carry no information; all-abstain gets the prior argmax") {
    val docs = Seq(
      (1L, Some("x"), Some("x")), (2L, Some("x"), None),
      (3L, Some("y"), Some("y")), (4L, None, None))
      .toDF("id", "lf1", "lf2")
    val p = LabelModel.fit(docs, Seq(col("lf1"), col("lf2")), classes,
      iters = 3)
    val got = LabelModel.labelDocs(
        docs, Seq(col("lf1"), col("lf2")), classes, p)
      .select("id", "y_hat", "post_ppm")
      .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == "x" && got(3L)._2 == "y")
    assert(got(2L)._2 == "x", "a lone non-abstain vote must decide")
    // all-abstain: posterior = prior; x outnumbers y 2:1 in the fit
    assert(got(4L)._2 == "x")
    assert(got(4L)._3 < 800000L,
      "an all-abstain doc must not get a confident posterior")
  }

  test("posteriors sum to ~1e6 and undeclared votes fail loudly") {
    val p = LabelModel.DsParams(Seq(800000L, 700000L),
      Seq(500000L, 500000L))
    val post = LabelModel.posteriorsPpm(
      Seq(Some("x"), Some("y")), classes, p)
    assert(math.abs(post.sum - 1000000L) <= classes.size,
      s"posteriors off the grid: $post")
    val docs = Seq((1L, "z", "x")).toDF("id", "lf1", "lf2")
    val e = intercept[IllegalArgumentException] {
      LabelModel.fit(docs, Seq(col("lf1"), col("lf2")), classes, 2)
    }
    assert(e.getMessage.contains("not in the declared class list"))
  }

  test("batch pattern counts fold to the full-corpus fit") {
    val docs = (0 until 40).map { i =>
      val t = if (i % 2 == 0) "x" else "y"
      (i.toLong, t, if (i % 5 == 0) (if (t == "x") "y" else "x") else t)
    }.toDF("id", "lf1", "lf2")
    val votes = Seq(col("lf1"), col("lf2"))
    val full = LabelModel.fit(docs, votes, classes, iters = 4)
    val folded = LabelModel
      .votePatternCounts(docs.filter(col("id") < 17), votes)
      .unionByName(
        LabelModel.votePatternCounts(docs.filter(col("id") >= 17), votes))
      .groupBy(col("v1"), col("v2"))
      .agg(org.apache.spark.sql.functions.sum(col("n")).as("n"))
      .collect().toSeq
      .map(r => ((1 to 2).map(i => Option(r.getAs[String](s"v$i"))),
        r.getAs[Long]("n")))
    val p = LabelModel.dsFit(folded, classes, iters = 4)
    assert(p == full, "folded-count refit must equal the full fit")
  }

  test("three-voter majority wins under a symmetric fit") {
    val docs = (0 until 30).map { i =>
      val t = if (i % 2 == 0) "x" else "y"
      val flip = if (t == "x") "y" else "x"
      // each LF wrong on a different disjoint tenth of the docs
      (i.toLong,
        if (i % 10 == 0) flip else t,
        if (i % 10 == 3) flip else t,
        if (i % 10 == 6) flip else t)
    }.toDF("id", "lf1", "lf2", "lf3")
    val votes = Seq(col("lf1"), col("lf2"), col("lf3"))
    val p = LabelModel.fit(docs, votes, classes, iters = 5)
    val got = LabelModel.labelDocs(docs, votes, classes, p)
      .select("id", "y_hat").as[(Long, String)].collect().toMap
    (0 until 30).foreach { i =>
      val t = if (i % 2 == 0) "x" else "y"
      assert(got(i.toLong) == t, s"doc $i: majority label lost")
    }
  }
}
