package graft.ops

import graft.WithSpark
import org.scalatest.funsuite.AnyFunSuite

class UnigramSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  test("segment: hand-computed Viterbi picks the max-likelihood " +
      "split, ties prefer the longer earlier piece, coverage never fails") {
    val logp = Map(
      "ab" -> -1.0, "cd" -> -1.0, "abc" -> -3.5,
      "a" -> -3.0, "b" -> -3.0, "c" -> -3.0, "d" -> -3.0)
    // ab|cd = -2 beats abc|d = -6.5 and any char split (>= -6 worse)
    assert(Unigram.segment("abcd", logp, 4) == Vector("ab", "cd"))
    // exact tie between x|yz and xy|z: ascending split points with
    // strictly-better updates keep the FIRST (longer-last-piece at
    // each position) — here xy|z wins because position 2 prefers
    // "xy" over "x","y" paths of equal score? verify by construction:
    val tie = Map("xy" -> -2.0, "yz" -> -2.0, "x" -> -1.0,
      "y" -> -1.0, "z" -> -1.0)
    // x|yz = -3, xy|z = -3, x|y|z = -3: all tie; best(2) fixes "x|y"
    // (-2) over "xy" (-2) only if strictly better — it is not, so
    // back(2)=0 ("xy" path found first? j ascends: j=0 gives "xy"
    // (-2), j=1 gives x|y (-2) not strictly better) => "xy" survives;
    // at i=3, j=1 ("yz" after "x", -3) then j=2 ("z" after "xy", -3
    // not strictly better) => x|yz wins
    assert(Unigram.segment("xyz", tie, 4) == Vector("x", "yz"))
    // a word with a character absent from the map still segments
    // (floor-scored char), and empty input yields no pieces
    assert(Unigram.segment("aqa", logp, 4) == Vector("a", "q", "a"))
    assert(Unigram.segment("", logp, 4).isEmpty)
  }

  test("seedPieces: substring counts weighted by word frequency; " +
      "rare multi-char pieces dropped, single chars always kept") {
    val words = Seq(("aba", 3L), ("ab", 2L)).toDF("w", "n")
    val got = Unigram.seedPieces(words, maxPieceLen = 2, minCount = 4)
      .as[(String, Long)].collect().toMap
    // "ab": 3 (in aba) + 2 (in ab) = 5 >= 4 kept; "ba": 3 dropped;
    // chars kept regardless: a = 3*2+2 = 8, b = 3+2 = 5
    assert(got == Map("a" -> 8L, "b" -> 5L, "ab" -> 5L))
  }

  test("train: EM concentrates mass on the dominant piece and the " +
      "vocabulary tokenizes the corpus through it") {
    val words = Seq(("abab", 10L), ("ab", 5L)).toDF("w", "n")
    val vocab = Unigram.train(words, vocabSize = 6, emIters = 3,
      maxPieceLen = 2, minSeedCount = 2)
    val m = vocab.toMap
    // Viterbi under the seed already segments abab -> ab|ab and
    // ab -> ab (log p("ab") beats two chars), so EM counts:
    // ab = 10*2 + 5 = 25; chars floor at 1
    assert(m("ab") == 25L)
    assert(m("a") == 1L && m("b") == 1L)
    // ranked (count DESC, piece ASC): ab first
    assert(vocab.head == ("ab", 25L))
    val toks = Unigram.tokenize(
        Seq((7L, "abab ab")).toDF("doc_id", "text"),
        "doc_id", org.apache.spark.sql.functions.col("text"), vocab,
        maxPieceLen = 2)
      .as[(Long, Seq[String], Long)].collect().head
    assert(toks == ((7L, Seq("ab", "ab", "ab"), 3L)))
  }

  test("train is deterministic across invocations and repartitionings") {
    val base = Seq(("spark", 4L), ("sparse", 3L), ("park", 5L),
      ("parse", 2L), ("spar", 1L))
    val v1 = Unigram.train(base.toDF("w", "n"), vocabSize = 12)
    val v2 = Unigram.train(
      base.reverse.toDF("w", "n").repartition(7), vocabSize = 12)
    assert(v1 == v2)
    assert(v1.map(_._1).distinct.size == v1.size)
    // single chars all survive the prune (coverage)
    val chars = base.flatMap(_._1.toSeq).map(_.toString).toSet
    assert(chars.subsetOf(v1.map(_._1).toSet))
  }

  test("driver collects are cap-bounded: collectCapped keeps all " +
      "chars + top-cap multi pieces, and a non-binding cap leaves the " +
      "learned vocabulary identical") {
    // binding cap: 5 multi-char pieces, cap 2 — survivors are the top
    // 2 by (cnt DESC, piece ASC); every single char stays regardless
    val pieces = Seq(("ab", 9L), ("ba", 9L), ("abc", 7L), ("bc", 7L),
      ("cab", 1L), ("a", 2L), ("b", 1L), ("c", 1L))
      .toDF("piece", "cnt")
    val capped = Unigram.collectCapped(pieces, cap = 2)
    assert(capped == Map("ab" -> 9L, "ba" -> 9L,
      "a" -> 2L, "b" -> 1L, "c" -> 1L),
      s"cap selection broke (cnt DESC, piece ASC): $capped")
    // non-binding cap (the fixture regime): vocabulary is unchanged
    // against an effectively-uncapped run
    val words = Seq(("spark", 4L), ("sparse", 3L), ("park", 5L),
      ("parse", 2L), ("spar", 1L)).toDF("w", "n")
    val tight = Unigram.train(words, vocabSize = 12, seedCapFactor = 10)
    val loose = Unigram.train(words, vocabSize = 12,
      seedCapFactor = 100000)
    assert(tight == loose,
      "a non-binding seed cap must not change the learned vocabulary")
  }
}
