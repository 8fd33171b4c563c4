package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CooccurrenceSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  test("pmi matches hand-computed counts and margins (window=1)") {
    // "a b a b": directed window-1 pairs (a,b) (b,a) (a,b)
    // N=3, n_a•=2 n_b•=1, n_•b=2 n_•a=1
    // pmi(a,b) = ln(2·3/(2·2)) = ln 1.5; pmi(b,a) = ln(1·3/(1·1)) = ln 3
    val df = Seq("a b a b").toDF("text")
    val got = Cooccurrence.pmi(df,
        tokens = split(col("text"), " "), window = 1)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got.keySet == Set(("a", "b"), ("b", "a")))
    assert(got(("a", "b"))._1 == 2L)
    assert(got(("b", "a"))._1 == 1L)
    assert(math.abs(got(("a", "b"))._2 - math.log(1.5)) < 1e-8)
    assert(math.abs(got(("b", "a"))._2 - math.log(3.0)) < 1e-8)
  }

  test("window clips at document end; crosses no document boundary") {
    val df = Seq("x y", "z w").toDF("text")
    val got = Cooccurrence.pmi(df,
        tokens = split(col("text"), " "), window = 5)
      .select("a", "b").as[(String, String)].collect().toSet
    assert(got == Set(("x", "y"), ("z", "w"))) // no (y,z): different docs
  }

  test("minCount filters pairs but margins use the full count frame") {
    // "p q p q p q": pairs w=1 → (p,q)x3, (q,p)x2; N=5
    // with minCount=3 only (p,q) survives but its pmi must still use
    // N=5 and the q-margin that includes (q,p)'s contribution
    val df = Seq("p q p q p q").toDF("text")
    val got = Cooccurrence.pmi(df,
        tokens = split(col("text"), " "), window = 1, minCount = 3)
      .as[(String, String, Long, Double)].collect()
    assert(got.length == 1)
    val (a, b, n, p) = got.head
    assert((a, b, n) == ("p", "q", 3L))
    // n_p• = 3, n_•q = 3, N = 5 → ln(3·5/9)
    assert(math.abs(p - math.log(15.0 / 9.0)) < 1e-8)
  }

  test("textrank composition: pageRankInt over pairCounts ranks the " +
      "co-occurrence hub highest") {
    // star graph: hub co-occurs with every spoke, spokes only with hub
    val df = Seq("a hub", "b hub", "c hub", "d hub", "e hub").toDF("text")
    val edges = Cooccurrence.pairCounts(
        df, tokens = split(col("text"), " "), window = 1)
      .select("a", "b")
    val ranks = Graph.pageRankInt(edges, iters = 5)
      .as[(String, Long)].collect().toMap
    assert(ranks.size == 6)
    val hub = ranks("hub")
    for (s <- Seq("a", "b", "c", "d", "e"))
      assert(hub > ranks(s), s"hub must outrank spoke $s")
  }
}
