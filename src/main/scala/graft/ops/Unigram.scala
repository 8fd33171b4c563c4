package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenization at corpus scale
  * (Kudo 2018, arXiv:1804.10959) — the OTHER tokenizer family real
  * pipelines ship next to [[Bpe]]: pieces carry independent
  * log-probabilities and a word's tokenization is the max-likelihood
  * segmentation (Viterbi), instead of BPE's greedy merge replay.
  *
  * Scale shape — the [[Bpe]] device exactly: training never
  * re-iterates the corpus. ONE pass builds the distinct-pretoken
  * frequency table ([[Bpe.wordCounts]] — corpus-sized shuffle,
  * vocabulary-sized output); seeding and every EM iteration are then
  * map-side passes over that table with a BROADCAST piece table (a
  * flatMap Viterbi + one piece-count aggregation per iteration).
  * 100 TB of text costs one corpus pass + `emIters` small jobs over
  * the word table. Tokenization is per-row map-side work with the
  * broadcast vocabulary — zero shuffle.
  *
  * Simplifications vs the full SentencePiece trainer, chosen for
  * engine-portable determinism: hard (Viterbi) EM instead of
  * forward-backward expected counts, and one final count-ranked prune
  * to `vocabSize` instead of the iterative EM+prune loop. Counts stay
  * exact longs end-to-end, so the published vocabulary is integer
  * data (the committed-golden device hash-checks it); the only floats
  * are the per-iteration log-probs, derived deterministically from
  * those counts.
  *
  * Determinism: Viterbi ties prefer the LONGER last piece (smaller
  * split point scans first and later candidates must be STRICTLY
  * better), prune ties break (count DESC, piece ASC) — the learned
  * vocabulary is a pure function of the corpus.
  */
object Unigram {

  /** Max-likelihood segmentation of one word under `logp`. Every
    * character of `word` must be scorable (single chars are kept in
    * every vocabulary this object builds — full coverage by
    * construction); an unscorable character falls back to a floor
    * score so tokenization never throws on out-of-corpus bytes. */
  def segment(word: String, logp: scala.collection.Map[String, Double],
      maxPieceLen: Int): Vector[String] = {
    val n = word.length
    if (n == 0) return Vector.empty
    val floor = -1e9 // unseen single char: worse than any real piece
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        val lp =
          if (i - j == 1)
            logp.getOrElse(word.substring(j, i), floor)
          else logp.getOrElse(word.substring(j, i), Double.NaN)
        if (!lp.isNaN) {
          val s = best(j) + lp
          if (s > best(i)) { best(i) = s; back(i) = j }
        }
        j += 1
      }
      i += 1
    }
    var out = List.empty[String]
    var k = n
    while (k > 0) {
      out = word.substring(back(k), k) :: out
      k = back(k)
    }
    out.toVector
  }

  /** Seed piece counts from the (w, n) word table: every substring of
    * length ≤ `maxPieceLen`, weighted by word frequency; multi-char
    * pieces below `minCount` are dropped, single chars ALWAYS survive
    * (coverage). One map-side expansion + one vocabulary-sized
    * aggregation. */
  def seedPieces(words: DataFrame, maxPieceLen: Int,
      minCount: Long): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    words.select(col("w").cast("string"), col("n").cast("long"))
      .as[(String, Long)]
      .flatMap { case (w, n) =>
        for {
          j <- 0 until w.length
          k <- (j + 1) to math.min(w.length, j + maxPieceLen)
        } yield (w.substring(j, k), n)
      }
      .toDF("piece", "n")
      .groupBy("piece").agg(sum("n").as("cnt"))
      .filter(length(col("piece")) === 1 || col("cnt") >= minCount)
  }

  /** Aggregate-side bound on every driver collect of a (piece, cnt)
    * frame: ALL single chars survive (coverage is non-negotiable and
    * the charset is bounded by Unicode, not the corpus), multi-char
    * pieces are pruned to the top `cap` by (cnt DESC, piece ASC)
    * BEFORE collecting. The sort-limit plans as
    * TakeOrderedAndProject — per-partition bounded heaps, a
    * cap-sized driver merge — so driver memory is O(charset + cap)
    * however many distinct length-≤`maxPieceLen` substrings the
    * corpus has (a multilingual 100 TB corpus reaches 10⁷–10⁸; the
    * uncapped collect was a driver-memory funnel). This is
    * SentencePiece's own seed-vocab cap (`seed_sentencepiece_size`). */
  private[ops] def collectCapped(
      df: DataFrame, cap: Int): Map[String, Long] = {
    val spark = df.sparkSession
    import spark.implicits._
    val chars = df.filter(length(col("piece")) === 1)
      .as[(String, Long)].collect()
    val multi = df.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(cap)
      .as[(String, Long)].collect()
    (chars ++ multi).toMap
  }

  /** Learn a `vocabSize` unigram vocabulary from a (w, n) word table:
    * seed → `emIters` rounds of (broadcast scores → map-side Viterbi
    * → piece-count aggregation → re-score) → one count-ranked prune.
    * Returns (piece, cnt) with cnt the final EM count (exact longs;
    * single chars floor at 1 so coverage survives re-scoring).
    *
    * Driver state is bounded by `seedCapFactor × vocabSize` multi-char
    * pieces (+ the corpus charset) at every collect — the
    * [[collectCapped]] prune. The cap binds only on corpora whose
    * distinct piece space exceeds it; when it binds, pieces ranked
    * below the cap never enter EM, exactly SentencePiece's seed cap. */
  def train(words: DataFrame, vocabSize: Int, emIters: Int = 3,
      maxPieceLen: Int = 4, minSeedCount: Long = 2,
      seedCapFactor: Int = 10): Seq[(String, Long)] = {
    require(vocabSize >= 1, s"vocabSize must be >= 1: $vocabSize")
    require(emIters >= 1 && emIters <= 20,
      s"emIters out of range: $emIters")
    require(seedCapFactor >= 1,
      s"seedCapFactor must be >= 1: $seedCapFactor")
    val cap = (vocabSize.toLong * seedCapFactor)
      .min(Int.MaxValue.toLong).toInt
    val spark = words.sparkSession
    import spark.implicits._
    val wc = words.select(col("w").cast("string"), col("n").cast("long"))
      .as[(String, Long)]
      .cache() // vocabulary-sized; read once per EM iteration
    try {
      var pieces =
        collectCapped(seedPieces(words, maxPieceLen, minSeedCount), cap)
      (1 to emIters).foreach { _ =>
        val total = math.max(1L, pieces.valuesIterator.sum)
        val logp = pieces.map { case (p, c) =>
          p -> math.log(c.toDouble / total.toDouble)
        }
        val bc = spark.sparkContext.broadcast(logp)
        // Viterbi emits only pieces already in `pieces` (≤ cap multi),
        // so this cap is a structural bound, never a binding prune
        val counted = collectCapped(
          wc.flatMap { case (w, n) =>
            segment(w, bc.value, maxPieceLen).map(p => (p, n))
          }
          .toDF("piece", "n")
          .groupBy("piece").agg(sum("n").as("cnt")), cap)
        // Viterbi-unused single chars keep a floor count of 1: a char
        // with log(0) next round would break coverage for good
        pieces = pieces.collect {
          case (p, _) if p.length == 1 =>
            p -> math.max(counted.getOrElse(p, 0L), 1L)
          case (p, _) if counted.getOrElse(p, 0L) > 0 =>
            p -> counted(p)
        }
        bc.destroy()
      }
      val chars = pieces.filter(_._1.length == 1).toSeq
      val multi = pieces.filter(_._1.length > 1).toSeq
        .sortBy { case (p, c) => (-c, p) }
        .take(math.max(0, vocabSize - chars.size))
      (chars ++ multi).sortBy { case (p, c) => (-c, p) }
    } finally { wc.unpersist(false); () }
  }

  /** Tokenize a text column under a learned (piece, cnt) vocabulary:
    * map-side only (broadcast score map), emitting the token array
    * and its length. Output: (id, tokens array<string>, n_tok) — the
    * [[Bpe.tokenize]] contract. */
  def tokenize(df: DataFrame, id: String, text: Column,
      vocab: Seq[(String, Long)], maxPieceLen: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val total = math.max(1L, vocab.map(_._2).sum)
    val logp = vocab.map { case (p, c) =>
      p -> math.log(c.toDouble / total.toDouble)
    }.toMap
    val bc = spark.sparkContext.broadcast(logp)
    df.select(col(id).cast("long").as("id"), Text.words(text).as("ws"))
      .as[(Long, Seq[String])]
      .map { case (i, ws) =>
        val toks = ws.iterator
          .flatMap(w => segment(w, bc.value, maxPieceLen)).toSeq
        (i, toks, toks.length.toLong)
      }
      .toDF(id, "tokens", "n_tok")
  }
}
