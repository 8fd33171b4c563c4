package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenization at corpus scale (Sennrich et al.
  * 2016, arXiv:1508.07909 — the GPT-2/Llama tokenizer family's merge
  * procedure).
  *
  * Scale shape — the classic BPE-learning trick adapted to Spark:
  * training never iterates over the corpus. ONE pass builds the
  * distinct-pretoken frequency table (a `groupBy(word).count` —
  * corpus-sized shuffle, vocabulary-sized output); every merge
  * iteration is then a map-side application of the current merges
  * (broadcast rank table) over that table plus one pair-count
  * aggregation and a 1-row argmax collect. 100 TB of text with a 5M-word
  * vocabulary costs one corpus pass + numMerges small jobs over 5M rows.
  * Tokenization is per-row map-side work with a broadcast rank map —
  * zero shuffle.
  *
  * Determinism: pair-count ties break lexicographically on (a, b), so
  * the learned merge sequence is a pure function of the corpus — the
  * committed-golden device applies.
  */
object Bpe {

  /** Greedy merge application to one pretoken: start from characters,
    * repeatedly merge the LOWEST-rank adjacent pair until none has a
    * rank. O(L²) worst case on pretoken length L — bounded small by
    * the pretokenizer. */
  def applyMerges(word: String, rank: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    var done = syms.length < 2
    while (!done) {
      var best = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = i }
        i += 1
      }
      if (best < 0 || bestRank == Int.MaxValue) done = true
      else {
        syms = (syms.take(best) :+ (syms(best) + syms(best + 1))) ++
          syms.drop(best + 2)
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  /** Distinct-pretoken frequency table for training: (w, n). The one
    * corpus-sized job in the whole procedure. */
  def wordCounts(df: DataFrame, text: Column): DataFrame =
    df.select(explode(Text.words(text)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))

  /** Learn `numMerges` merges from a (w, n) frequency table. Each
    * iteration: broadcast the current ranks, apply map-side, count
    * adjacent symbol pairs weighted by word frequency, take the
    * (count DESC, a ASC, b ASC) argmax — one small aggregation + a
    * one-row collect per merge. Stops early when no pair repeats. */
  def learnMerges(words: DataFrame, numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    val spark = words.sparkSession
    import spark.implicits._
    val wc = words.select(col("w").cast("string"), col("n").cast("long"))
      .as[(String, Long)]
      .cache() // vocabulary-sized; read once per merge iteration
    try {
      var merges = Vector.empty[(String, String)]
      var exhausted = false
      while (merges.length < numMerges && !exhausted) {
        val rank = merges.zipWithIndex.toMap
        val top = wc.flatMap { case (w, n) =>
            val syms = applyMerges(w, rank)
            (0 until syms.length - 1).map(i => (syms(i), syms(i + 1), n))
          }
          .toDF("a", "b", "n")
          .groupBy("a", "b").agg(sum("n").as("cnt"))
          .filter(col("cnt") >= 2) // a pair seen once gains nothing
          .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
          .limit(1)
          .collect()
        if (top.isEmpty) exhausted = true
        else merges :+= ((top(0).getString(0), top(0).getString(1)))
      }
      merges
    } finally { wc.unpersist(false); () }
  }

  /** Tokenize a text column under a learned merge list: map-side only
    * (broadcast rank map), emitting the token array and its length.
    * Output: (id, tokens array<string>, n_tok). */
  def tokenize(
      df: DataFrame, id: String, text: Column,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    df.select(col(id).cast("long").as("id"), Text.words(text).as("ws"))
      .as[(Long, Seq[String])]
      .map { case (i, ws) =>
        val toks = ws.iterator.flatMap(w => applyMerges(w, bc.value)).toSeq
        (i, toks, toks.length.toLong)
      }
      .toDF(id, "tokens", "n_tok")
  }
}
